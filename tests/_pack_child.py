"""Child entry point for the cross-cluster-width packing determinism test:
run pack_sequences with DEFAULT num_bins on a fixed literal corpus at the
requested local[N] width and print one JSON line of the sorted assignment.
Two different widths must print byte-identical lines (round-4 verdict
item #3: seq_id must be a pure function of the data, not the cluster)."""

from __future__ import annotations

import json
import sys

from amr_kg_spark.operators.textprep import pack_sequences
from amr_kg_spark.session import get_spark


def main(cores: str) -> None:
    spark = get_spark(app_name=f"pack-det-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    rows = [(i, (i * 37) % 100 + 1) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    packed = pack_sequences(docs, budget=64)  # default num_bins
    out = sorted(
        (r.doc_id, r.pack_bin, r.seq_id, r.seq_offset)
        for r in packed.collect()
    )
    print("PACKRESULT:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1])
