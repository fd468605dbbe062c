from mysql_syncer_spark.plans.plan import (
    Action,
    SyncUnit,
    SyncPlan,
    plan_sync,
    schemas_match,
)

__all__ = ["Action", "SyncUnit", "SyncPlan", "plan_sync", "schemas_match"]
