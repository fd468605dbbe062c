"""MySQL-compat DDL normalization + comparison (S4).

The reference compares schemas as normalized ``SHOW CREATE TABLE``
strings: (a) strip the volatile ``AUTO_INCREMENT=<n>`` counter
(Synchronizer.php:199-204), (b) alphabetize CONSTRAINT lines because
MySQL reorders them on create (TableConnection.php:413-455). The
engine's default compare is structural (plans/plan.py schemas_match);
this module is the compatibility mode for JDBC/MySQL targets where the
authoritative schema really is the DDL string.
"""

from __future__ import annotations

import re

_AUTO_INC = re.compile(r"AUTO_INCREMENT=\d+ ", re.IGNORECASE)


def normalize_mysql_ddl(ddl: str) -> str:
    """Normalize one SHOW CREATE TABLE string for comparison.

    Mirrors the reference: strip AUTO_INCREMENT counters, sort the
    CONSTRAINT lines in place (first CONSTRAINT line's slot onward),
    normalize line endings/trailing whitespace.
    """
    ddl = _AUTO_INC.sub("", ddl)
    lines = [ln.rstrip() for ln in ddl.replace("\r\n", "\n").split("\n")]

    # alphabetize the CONSTRAINT block (TableConnection.php:419-455):
    # collect constraint lines, sort them, and write them back into the
    # same positions in order
    idxs = [
        i for i, ln in enumerate(lines) if ln.lstrip().startswith("CONSTRAINT")
    ]
    if idxs:
        # normalize trailing commas inside the block: every sorted line
        # except the block's last keeps a comma
        block = []
        for i in idxs:
            ln = lines[i].rstrip()
            block.append(ln[:-1] if ln.endswith(",") else ln)
        block.sort()
        for pos, i in enumerate(idxs):
            suffix = "," if pos < len(idxs) - 1 else ""
            # preserve original indentation of that slot
            indent = lines[i][: len(lines[i]) - len(lines[i].lstrip())]
            lines[i] = indent + block[pos].lstrip() + suffix
    return "\n".join(lines)


def ddl_equal(a: str, b: str) -> bool:
    """The reference's schema-equality check (Synchronizer.php:193-204)."""
    return normalize_mysql_ddl(a) == normalize_mysql_ddl(b)
