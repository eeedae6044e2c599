"""Skew stress bench: inject a mega-cluster into the sf0.1 corpus and
measure that extended dedup wall time stays LINEAR in the hot bucket's
size, not quadratic (the north rule's "skew handled explicitly" clause:
hot buckets collapse by exact hash + rep-cap + spanning-forest emission,
stages/candidates.py — all-pairs would be 10^10 comparisons here).

Usage: python tools/bench_skew.py [n_hot]   (default 100_000)

Prints one JSON line: baseline wall, skewed wall, the hot-cluster size
found, and the per-image overhead of the hot rows.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from deduplicator_ray import fixtures, tuning
    from deduplicator_ray import io as dio
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines import image_dedup as ip

    tuning.tune()
    cfg = PipelineConfig()
    base_path = fixtures.images_path("sf0.1", cfg.hash_size)

    # skewed corpus = sf0.1 ∪ n_hot byte-identical clones of one image
    # (fresh ids) — one proc_hash bucket of n_hot+1 members
    work = tempfile.mkdtemp(prefix="skewbench_", dir="/tmp")
    try:
        for f in glob.glob(os.path.join(base_path, "*.parquet")):
            shutil.copy(f, work)
        one = pq.read_table(glob.glob(os.path.join(base_path, "*.parquet"))[0])
        hot = fixtures.clone_rows(one, n_hot)
        pq.write_table(hot, os.path.join(work, "hot.parquet"))

        # each leg repeats (min wall) — this host's CPU steal adds ±40% to
        # a single run (BASELINE.md), which would make a one-shot
        # baseline-vs-skewed delta meaningless
        repeats = max(1, int(os.environ.get("GRAFT_BENCH_REPEATS", "2")))

        def run(path: str) -> tuple[float, int, "object"]:
            walls, n, ds = [], 0, None
            for _ in range(repeats):
                t0 = time.time()
                ds = ip.extended_clusters(dio.read_parquet(path), cfg) \
                    .materialize()
                n = ds.count()
                walls.append(round(time.time() - t0, 3))
            return min(walls), n, ds

        base_wall, base_n, _ = run(base_path)
        skew_wall, skew_n, skew_ds = run(work)

        # the CLONE cluster must come out as ONE complete component (read
        # from the already-materialized timed run — no extra pass).  NB:
        # the sf corpus already contains its own mega-cluster (the
        # degenerate/media rows, 42k members at sf0.1), so "global max"
        # would check the wrong cluster for small n_hot — resolve the
        # cluster THROUGH a clone id.
        cl = skew_ds.select_columns(["cluster_id", "image_id"]).to_pandas()
        hot_cid = cl.loc[cl["image_id"].str.startswith("hot/"),
                         "cluster_id"].iloc[0]
        hot_cluster_size = int((cl["cluster_id"] == hot_cid).sum())

        print(json.dumps({
            "metric": "skew stress: extended dedup with one mega-bucket",
            "n_hot": n_hot,
            "baseline_wall_s": base_wall,
            "skewed_wall_s": skew_wall,
            "overhead_s_per_1k_hot": round(
                (skew_wall - base_wall) / (n_hot / 1000), 4),
            "baseline_clustered": base_n,
            "skewed_clustered": skew_n,
            "hot_cluster_size": hot_cluster_size,
            "hot_cluster_complete": hot_cluster_size >= n_hot,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main()
