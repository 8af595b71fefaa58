"""Deployment-equivalence check: the TPU inference path (one-hot MXU
segment ops, bf16_3x matmul precision — ops/segment.py round 5) must
produce the SAME decisions as the exact CPU scatter path on real
detector outputs: per-node classes, DBSCAN cluster partitions, and
per-cluster object classes.

Runs FrameDetector with the committed fixture-trained weights
(runs/fixture_artifact) over mini-RadarScenes fixture frames once per
backend (each in its own subprocess — the backend is process-global)
and diffs the decision records.  Cluster ids are compared as partitions
(membership signatures), not raw ids.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     python scripts/check_tpu_decision_equivalence.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

N_FRAMES = 12


def run_backend(backend: str, out_path: str):
    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import numpy as np

    from fixtures_radarscenes import make_mini_radarscenes
    from graph_neural_network_for_radar_perception_tpu.config.config import (
        GNNConfig,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        preprocess_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.data.radarscenes import (
        SequenceCache,
    )
    from graph_neural_network_for_radar_perception_tpu.infer.pipeline import (
        FrameDetector,
    )
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        init_params,
    )
    from graph_neural_network_for_radar_perception_tpu.utils.checkpoint import (
        load_params_msgpack,
    )

    with open(os.path.join(REPO, "runs/fixture_artifact/config.json")) as f:
        saved = json.load(f)
    cfg = GNNConfig(
        max_nodes=int(saved["max_nodes"]),
        max_clusters=int(saved["max_clusters"]),
        temporal_window_size=int(saved["temporal_window_size"]),
    )
    template = init_params(cfg, jax.random.key(0))
    params = load_params_msgpack(
        template, os.path.join(REPO, "runs/fixture_artifact/weights.msgpack")
    )
    det = FrameDetector(cfg, params, eps=1.4, use_object_head=True)

    root = tempfile.mkdtemp(prefix=f"decide_{backend}_")
    make_mini_radarscenes(root, seed=777, n_scenes=N_FRAMES + 6,
                          n_objects=4, seq_name="sequence_9",
                          category="validation")
    cache = SequenceCache(root, "data", max_sequences=2)
    records = []
    for w in list(cache.windows("sequence_9", 5))[:N_FRAMES]:
        fr = preprocess_frame(cache.extract_window("sequence_9", w), cfg)
        if fr is None:
            records.append(None)
            continue
        d = det.detect_frame_arrays(fr)
        # Partition signature: for each cluster, the sorted node-index
        # tuple + its object class — invariant to cluster id relabeling.
        clusters = {}
        for node, cid in enumerate(d.node2cluster.tolist()):
            clusters.setdefault(cid, []).append(node)
        sig = sorted(
            (tuple(v), int(d.cluster_class[k])) for k, v in clusters.items()
        )
        records.append({
            "node_class": d.node_class.tolist(),
            "partition": [[list(m), c] for m, c in sig],
        })
    with open(out_path, "w") as f:
        json.dump({"backend": jax.default_backend(), "records": records}, f)
    print(f"{backend}: wrote {sum(r is not None for r in records)} frames "
          f"(jax backend={jax.default_backend()})", file=sys.stderr)


def main():
    if len(sys.argv) > 3 and sys.argv[1] == "--backend":
        run_backend(sys.argv[2], sys.argv[3])
        return
    outs = {}
    for backend in ("cpu", "tpu"):
        out = os.path.join(tempfile.gettempdir(), f"decide_{backend}.json")
        r = subprocess.run(
            [sys.executable, __file__, "--backend", backend, out],
            timeout=1800,
        )
        assert r.returncode == 0, f"{backend} runner failed"
        with open(out) as f:
            outs[backend] = json.load(f)
    assert outs["tpu"]["backend"] == "tpu", (
        "tpu runner fell back to " + outs["tpu"]["backend"]
    )
    n_cmp = 0
    for i, (a, b) in enumerate(
        zip(outs["cpu"]["records"], outs["tpu"]["records"])
    ):
        assert (a is None) == (b is None), f"frame {i}: presence differs"
        if a is None:
            continue
        assert a["node_class"] == b["node_class"], (
            f"frame {i}: node classes differ"
        )
        assert a["partition"] == b["partition"], (
            f"frame {i}: cluster partition / object classes differ"
        )
        n_cmp += 1
    print(f"OK: {n_cmp} frames — TPU decisions (node classes, DBSCAN "
          f"partitions, object classes) identical to the exact CPU path")


if __name__ == "__main__":
    main()
