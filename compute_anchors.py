"""Anchor prior fitting (CLI surface of reference ``compute_anchors.py``).

Collects all annotated event durations (flat or grouped layouts), clusters
them into 9 centers with the built-in 1-D k-means (replacing the sklearn
dependency), sorts and splits 3/3/3 into sm/md/lg anchors, and writes them
back into the YAML config.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from audioyolo_tpu.config import set_config_anchors
from audioyolo_tpu.data import AudioDataset
from audioyolo_tpu.ops import kmeans_1d

SEED = 42
NUM_CLUSTERS = 9


def collect_durations(annotations) -> np.ndarray:
    durations = []
    if not AudioDataset.is_grouped_annotations(annotations):
        for segments in annotations.values():
            for seg in segments.values():
                durations.append(seg["end"] - seg["start"])
    else:
        for groups in annotations.values():
            for segments in groups.values():
                for seg in segments.values():
                    durations.append(seg["end"] - seg["start"])
    return np.asarray(durations, np.float64)


def main():
    parser = argparse.ArgumentParser(description="Anchor segment generation")
    parser.add_argument("--annotations_path", type=str, required=True, metavar="",
                        help="JSON annotations path")
    parser.add_argument("--annotator", type=str, default="annotator_a", metavar="")
    parser.add_argument("--config", type=str, default="config/config.yaml", metavar="")
    parser.add_argument("--init", type=str, default="k-means++",
                        choices=["k-means++", "random"], metavar="")
    parser.add_argument("--n_init", type=int, default=10, metavar="")
    parser.add_argument("--max_iter", type=int, default=500, metavar="")
    parser.add_argument("--tol", type=float, default=1e-10, metavar="")
    args = parser.parse_args()

    with open(args.annotations_path, "r") as f:
        annotations = json.load(f)["annotations"][args.annotator]

    durations = collect_durations(annotations)
    centers, inertia = kmeans_1d(
        durations, NUM_CLUSTERS, init=args.init, n_init=args.n_init,
        max_iter=args.max_iter, tol=args.tol, seed=SEED,
    )
    sm, md, lg = centers[:3], centers[3:6], centers[6:]
    set_config_anchors(args.config, sm, md, lg)
    print(f"fitted anchors (inertia {inertia:.4f}):")
    print(f"  sm: {sm.tolist()}\n  md: {md.tolist()}\n  lg: {lg.tolist()}")


if __name__ == "__main__":
    main()
