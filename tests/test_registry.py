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


def test_broken_ops_module_fails_loudly(monkeypatch):
    """A broken ops module must raise, not silently shrink the contract:
    an ImportError swallowed here would blank that module's oracle rows
    in CORRECTNESS and the driver would report missing keys instead of
    the real traceback (round-4 verdict item 2)."""
    import pytest

    from ecc_spark import registry

    monkeypatch.setattr(
        registry, "_OP_MODULES", ("relational", "definitely_not_a_module")
    )
    with pytest.raises(ImportError, match="definitely_not_a_module"):
        registry.queries()


def test_n_docs_parses_numeric_sf_suffix():
    """_n_docs keys off the parsed sf<float> suffix, not substring
    matching — 'sf1'/'sf0.5'/trailing slashes must not silently fall
    back to the 60-doc toy corpus (round-4 verdict item 6)."""
    from ecc_spark.ops.pipeline_ops import _n_docs

    assert _n_docs("/root/testdata/sf0.001") == 60
    assert _n_docs("/root/testdata/sf0.01") == 150
    assert _n_docs("/root/testdata/sf0.01/") == 150
    assert _n_docs("/root/testdata/sf0.1") == 400
    assert _n_docs("/root/testdata/sf0.5") == 400
    assert _n_docs("/root/testdata/sf1") == 4000
    assert _n_docs("/root/testdata/sf10/") == 40000
    # unparseable paths keep the safe toy default — but LOUDLY (a bench
    # pointed at 'sf0.1-v2' silently measuring 60 docs is the failure)
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert _n_docs("/tmp/some_fixture_dir") == 60
    assert any("toy corpus" in str(w.message) for w in caught)
