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


#: verbatim MySQL 8.0-style SHOW CREATE TABLE output — the shape the
#: reference's own normalization runs on (TableConnection.php:419-455
#: alphabetize; Synchronizer.php:199-204 counter strip): multiple
#: constraints with ON DELETE/UPDATE clauses, KEY lines, a column-level
#: AUTO_INCREMENT attribute, and charset/collation table options.
GOLDEN_IN = """CREATE TABLE `child` (
  `id` int NOT NULL AUTO_INCREMENT,
  `parent_id` int DEFAULT NULL,
  `other_id` int DEFAULT NULL,
  `name` varchar(191) COLLATE utf8mb4_unicode_ci DEFAULT NULL,
  PRIMARY KEY (`id`),
  KEY `fk_parent` (`parent_id`),
  KEY `fk_other` (`other_id`),
  CONSTRAINT `zz_last` FOREIGN KEY (`parent_id`) REFERENCES `parent` (`id`) ON DELETE CASCADE,
  CONSTRAINT `aa_first` FOREIGN KEY (`other_id`) REFERENCES `other` (`id`),
  CONSTRAINT `mm_mid` FOREIGN KEY (`parent_id`) REFERENCES `parent` (`id`) ON UPDATE RESTRICT
) ENGINE=InnoDB AUTO_INCREMENT=1337 DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_unicode_ci"""

#: what the reference pipeline produces for GOLDEN_IN, byte for byte:
#: constraints alphabetized with commas re-seamed (last bare), the
#: table-option counter stripped WITH its trailing space, the
#: column-attribute AUTO_INCREMENT untouched (no '=<n>' to match).
GOLDEN_OUT = """CREATE TABLE `child` (
  `id` int NOT NULL AUTO_INCREMENT,
  `parent_id` int DEFAULT NULL,
  `other_id` int DEFAULT NULL,
  `name` varchar(191) COLLATE utf8mb4_unicode_ci DEFAULT NULL,
  PRIMARY KEY (`id`),
  KEY `fk_parent` (`parent_id`),
  KEY `fk_other` (`other_id`),
  CONSTRAINT `aa_first` FOREIGN KEY (`other_id`) REFERENCES `other` (`id`),
  CONSTRAINT `mm_mid` FOREIGN KEY (`parent_id`) REFERENCES `parent` (`id`) ON UPDATE RESTRICT,
  CONSTRAINT `zz_last` FOREIGN KEY (`parent_id`) REFERENCES `parent` (`id`) ON DELETE CASCADE
) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_unicode_ci"""


def test_golden_mysql8_show_create_table():
    """Byte-for-byte golden of both reference behaviors on a verbatim
    MySQL 8 SHOW CREATE TABLE string."""
    assert normalize_mysql_ddl(GOLDEN_IN) == GOLDEN_OUT


def test_golden_column_attribute_auto_increment_survives():
    """Only the table-option counter (AUTO_INCREMENT=<n> + space) is
    volatile; the column attribute is real schema and must survive —
    the reference pattern '%(AUTO_INCREMENT=[0-9]+ )%' can't touch it."""
    norm = normalize_mysql_ddl(GOLDEN_IN)
    assert "`id` int NOT NULL AUTO_INCREMENT," in norm
    assert "AUTO_INCREMENT=" not in norm


def test_golden_mysql_reordering_equal():
    """MySQL re-emits the same table with constraints reordered and the
    counter advanced after inserts; the reference (and we) must judge
    the schemas equal."""
    reordered = GOLDEN_IN.replace("AUTO_INCREMENT=1337 ", "AUTO_INCREMENT=999999 ")
    lines = reordered.split("\n")
    cons = [ln for ln in lines if ln.lstrip().startswith("CONSTRAINT")]
    rest_head = [ln for ln in lines if not ln.lstrip().startswith("CONSTRAINT")][:-1]
    tail = lines[-1]
    shuffled = [c.rstrip(",") for c in reversed(cons)]
    shuffled = [c + "," for c in shuffled[:-1]] + [shuffled[-1]]
    rebuilt = "\n".join(rest_head + shuffled + [tail])
    assert ddl_equal(GOLDEN_IN, rebuilt)
    # and a REAL difference (dropped ON DELETE action) still trips it
    assert not ddl_equal(GOLDEN_IN, rebuilt.replace(" ON DELETE CASCADE", ""))


def test_constraint_comma_placement():
    """Sorting must keep the block syntactically valid: commas on all
    but the last constraint line."""
    norm = normalize_mysql_ddl(DDL_A)
    lines = [l.strip() for l in norm.split("\n") if l.strip().startswith("CONSTRAINT")]
    assert lines[0].startswith("CONSTRAINT `fk_a`") and lines[0].endswith(",")
    assert lines[1].startswith("CONSTRAINT `fk_b`") and not lines[1].endswith(",")
