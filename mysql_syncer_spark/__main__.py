"""``python -m mysql_syncer_spark`` — see cli.py for the subcommands."""

import sys

from mysql_syncer_spark.cli import main

sys.exit(main())
