"""DDL normalization (MySQL-compat schema compare, S4)."""

from mysql_syncer_spark.sources.ddl import ddl_equal, normalize_mysql_ddl

DDL_A = """CREATE TABLE `t` (
  `id` int NOT NULL,
  `ref` int DEFAULT NULL,
  PRIMARY KEY (`id`),
  CONSTRAINT `fk_b` FOREIGN KEY (`ref`) REFERENCES `b` (`id`),
  CONSTRAINT `fk_a` FOREIGN KEY (`ref`) REFERENCES `a` (`id`)
) ENGINE=InnoDB AUTO_INCREMENT=4242 DEFAULT CHARSET=utf8mb4"""

DDL_B = """CREATE TABLE `t` (
  `id` int NOT NULL,
  `ref` int DEFAULT NULL,
  PRIMARY KEY (`id`),
  CONSTRAINT `fk_a` FOREIGN KEY (`ref`) REFERENCES `a` (`id`),
  CONSTRAINT `fk_b` FOREIGN KEY (`ref`) REFERENCES `b` (`id`)
) ENGINE=InnoDB AUTO_INCREMENT=77 DEFAULT CHARSET=utf8mb4"""


def test_auto_increment_stripped():
    assert "AUTO_INCREMENT" not in normalize_mysql_ddl(DDL_A)


def test_constraint_order_and_counter_insensitive():
    """MySQL reorders CONSTRAINT lines on create and bumps the counter;
    neither is a real schema difference (TableConnection.php:413-418)."""
    assert ddl_equal(DDL_A, DDL_B)


def test_real_difference_detected():
    changed = DDL_B.replace("`ref` int", "`ref` bigint")
    assert not ddl_equal(DDL_A, changed)


def test_constraint_comma_placement():
    """Sorting must keep the block syntactically valid: commas on all
    but the last constraint line."""
    norm = normalize_mysql_ddl(DDL_A)
    lines = [l.strip() for l in norm.split("\n") if l.strip().startswith("CONSTRAINT")]
    assert lines[0].startswith("CONSTRAINT `fk_a`") and lines[0].endswith(",")
    assert lines[1].startswith("CONSTRAINT `fk_b`") and not lines[1].endswith(",")
