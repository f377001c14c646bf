"""Product-analytics tour: the events-table operator family, composed.

    python examples/product_analytics.py [sf_dir]

Every stage is a registered, oracle-verified operator — this script runs
them as one session the way an analytics team would read a morning
dashboard, and prints compact summaries:

  1. conversion funnel          — q73 (chained conditional-min stages)
  2. multi-touch attribution    — q64 (user-keyed interval join)
  3. RFM segmentation           — q65 (broadcast exact-percentile scales)
  4. peak concurrency           — q55 (distributed sweep line)
  5. CUPED A/B readout          — q78 (variance-reduced experiment metric)
  6. audience overlap           — q79 (theta-sketch set algebra vs exact)
  7. capped wallet balances     — q77 (window-form non-associative scan)

All plans are partition-parallel on user-scale keys; nothing here
collects more than a report-sized result.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_osmosis_spark.operators import QUERIES, load_all
from dbt_osmosis_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    load_all()
    spark = get_spark(app_name="product-analytics", cpus=8)

    tour = [
        ("conversion funnel", "q73_funnel", None),
        ("multi-touch attribution (top rows)", "q64_multitouch_attribution", 5),
        ("RFM segments (top rows)", "q65_rfm_segments", 5),
        ("peak concurrency by hour (top rows)", "q55_concurrent_intervals", 5),
        ("CUPED A/B readout", "q78_cuped_adjusted_ab", None),
        ("audience overlap (theta sketches)", "q79_kmv_set_algebra", None),
        ("capped wallet balances (top rows)", "q77_capped_running_balance", 5),
    ]
    for title, name, limit in tour:
        df = QUERIES[name](spark, sf_dir)
        if limit:
            df = df.limit(limit)
        print(f"\n== {title} ({name}) ==")
        df.show(truncate=False)


if __name__ == "__main__":
    main()
