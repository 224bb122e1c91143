"""Non-vacuity pins for the tier-2 __spark_entry__ contract entries.

VERDICT r2 "What's wrong" #1: `anti_join_customers` used to return 0 rows
at sf<=0.01, so a 0-row oracle match proved only that the anti-join
compiled.  The round-3 predicate ("customers with no 1-URGENT order")
must survive non-empty AND non-total at every sf — pinned here against
the two small sf dirs so a data regen that re-vacuates it fails loudly.
"""

import os

import pytest

import __spark_entry__ as entrymod

SFS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
       if os.path.isdir(d)]


@pytest.mark.parametrize("sf_dir", SFS)
def test_anti_join_customers_filters_nontrivially(spark, sf_dir):
    q = entrymod.queries()["anti_join_customers"]
    survivors = q(spark, sf_dir).count()
    total = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).count()
    assert 0 < survivors < total, (
        f"anti_join_customers is vacuous at {sf_dir}: "
        f"{survivors}/{total} survivors"
    )


@pytest.mark.parametrize("sf_dir", SFS)
def test_semi_join_orders_nontrivial(spark, sf_dir):
    # same guard for the semi-join twin: some orders must match, some not
    q = entrymod.queries()["semi_join_orders"]
    kept = q(spark, sf_dir).agg({"n_orders": "sum"}).collect()[0][0]
    total = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).count()
    assert 0 < kept < total
