"""Distributed connected-components scale check (VERDICT r1 #7 done-bar).

Synthesizes 5M edges (1M chains of 5 + 1M random extra edges inside chains)
entirely inside Ray tasks, runs the distributed label-propagation path, and
reports wall time + driver peak RSS. The pre-fix implementation pulled the
full node→label table to the driver every round; the fixed one moves one
scalar per round, so driver RSS must stay near-flat.

Run: python scripts/cluster_scale_check.py [n_edges_millions]
"""

from __future__ import annotations

import resource
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    millions = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    n_chain_edges = int(millions * 1_000_000)

    import logging

    logging.getLogger("ray").setLevel(logging.ERROR)
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 log_to_driver=False)

    chain_len = 5  # nodes per chain -> component = chain

    def make_edges(batch: pa.Table) -> pa.Table:
        # ids are chain indices; emit chain_len-1 edges per chain
        base = batch.column("id").to_numpy(zero_copy_only=False) * chain_len
        offs = np.arange(chain_len - 1)
        a = (base[:, None] + offs[None, :]).reshape(-1)
        return pa.table({"id_a": pa.array(a, pa.int64()),
                         "id_b": pa.array(a + 1, pa.int64())})

    n_chains = n_chain_edges // (chain_len - 1)
    pairs = ray.data.range(n_chains, override_num_blocks=64).map_batches(
        make_edges, batch_format="pyarrow", zero_copy_batch=True
    )

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6  # GB-ish

    from opentelemetry_collector_contrib_ray.stages.cluster import connected_components

    t0 = time.time()
    labels = connected_components(pairs, driver_threshold=0, join_partitions=16)
    # consume without driver materialization: count + spot-check aggregates
    n_nodes = labels.count()
    n_clusters = labels.groupby("cluster").count().count()
    dt = time.time() - t0

    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    expect_nodes = n_chains * chain_len
    ok = n_nodes == expect_nodes and n_clusters == n_chains
    print(f"edges={n_chain_edges} nodes={n_nodes} (expect {expect_nodes}) "
          f"clusters={n_clusters} (expect {n_chains}) ok={ok}")
    print(f"wall={dt:.1f}s driver maxrss before={rss0:.2f}GB after={rss1:.2f}GB")
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
