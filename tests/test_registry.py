"""Registry-ordering invariants for the external correctness driver.

The driver truncates its check at the first ``DRIVER_WINDOW`` (=50) keys of
``queries()`` in registration order.  Round 3 lost hard correctness rows for
9 oracle-backed operators because they registered past that window; these
tests make a recurrence a pytest failure instead of a silent evidence gap.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from ecc_spark.registry import DRIVER_WINDOW


def test_every_oracle_backed_query_inside_driver_window():
    keys = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    window = set(keys[:DRIVER_WINDOW])
    outside = sorted(oracles - window)
    assert not outside, (
        f"{len(outside)} oracle-backed queries fall outside the driver's "
        f"first-{DRIVER_WINDOW} correctness window: {outside}"
    )


def test_oracle_count_fits_window():
    oracles = entrymod.oracle_sql()
    assert len(oracles) <= DRIVER_WINDOW, (
        f"{len(oracles)} oracle-backed queries but the driver only checks "
        f"{DRIVER_WINDOW}; fold or demote {len(oracles) - DRIVER_WINDOW}"
    )


def test_every_oracle_key_has_a_query():
    keys = set(entrymod.queries())
    dangling = sorted(set(entrymod.oracle_sql()) - keys)
    assert not dangling, f"oracle entries without queries(): {dangling}"
