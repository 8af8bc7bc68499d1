"""The reference's example consumer (/root/reference/examples/index.js):
subscribe to the collection, render the three top-5 trending reports as
state evolves — here driven by the replayed event stream, one report per
processed pass.

Run:  python examples/trending_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikitrender_spark.engine import WikiTrenderCollection
from wikitrender_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("trending-report", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as work:
        c = WikiTrenderCollection(spark, work, sf_dir=sf_dir)
        c.report_to(True)  # print the three top-5 reports after each merge
        edits = []
        c.on_edit(lambda row: edits.append(row["id"]))
        c.process_available()
        print(f"\n{c.pages().count()} live pages; "
              f"{len(edits)} edit callbacks fired")


if __name__ == "__main__":
    main()
