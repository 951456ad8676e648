"""Driver-side LSH candidate-pair builder scale check (r4 gate evidence).

Synthesizes survivor band rows AT the candidate_driver_rows gate boundary
(default 2M lean (band, bucket, doc_id) rows across ~666k buckets of 3)
and times `_candidate_pairs_vectorized` + reports driver peak RSS. The
gate is safe iff the pass stays in low single-digit seconds and RSS stays
well under a worker heap; beyond the gate the bucket-sharded map_groups
path takes over.

Run: python scripts/pairs_scale_check.py [n_rows_millions]
"""

from __future__ import annotations

import resource
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    millions = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    n_rows = int(millions * 1_000_000)

    import numpy as np
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.neardup import (
        _candidate_pairs_vectorized,
    )

    rng = np.random.default_rng(11)
    n_buckets = n_rows // 3  # mostly 3-member buckets (pairs ≈ rows)
    bucket_of_row = rng.integers(0, n_buckets, size=n_rows)
    tbl = pa.table({
        "band": pa.array((bucket_of_row % 16).astype(np.int32), pa.int32()),
        "bucket": pa.array(bucket_of_row.astype(np.int64), pa.int64()),
        "doc_id": pa.array(rng.integers(0, 1 << 40, size=n_rows),
                           pa.int64()),
    })
    t0 = time.perf_counter()
    pairs = _candidate_pairs_vectorized(tbl, "doc_id", 500,
                                        ["band", "bucket"])
    secs = time.perf_counter() - t0
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print({"survivor_rows": n_rows, "pairs": pairs.num_rows,
           "seconds": round(secs, 2), "driver_peak_rss_gb": round(rss_gb, 2)})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
