"""Train on the mini-RadarScenes fixture through the REAL data pipeline
and emit the committed proof-of-life artifact corpus:

    runs/fixture_artifact/
      weights.msgpack                     trained params (committed)
      config.json                         exact training configuration
      eval/semantic_segmentation/*.json   per-sequence confusion JSONs in
                                          the reference schema
      eval/object_classification/*.json   detection-eval confusion JSONs
      README.md                           recipe + aggregated P/R table

This is the framework's equivalent of the reference's shipped
`model_weights/gnn/<ts>/graph_based_detector.pt` + `performance/*.json`
corpus (reference performance/semantic_segmentation/sequence_108.json:1-30)
— reproducible end-to-end from this script: HDF5 windows → stationary
gating (RANSAC optional) → ego-compensation → ROI/dynamic filters → graph
build → training → per-sequence evaluation.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_fixture_artifact.py
      (add --cpu to force the CPU backend, --iters N to override)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

TRAIN_SEQS = [f"sequence_{i}" for i in (1, 2, 3, 4)]
HELDOUT_SEQS = ["sequence_5", "sequence_6"]
WINDOW = 5
OUT = os.path.join(REPO, "runs", "fixture_artifact")


def build_fixture(root: str):
    from fixtures_radarscenes import make_mini_radarscenes

    for i, name in enumerate(TRAIN_SEQS):
        make_mini_radarscenes(
            root, seed=100 + i, n_scenes=48, n_objects=4, seq_name=name,
            category="train",
        )
    for i, name in enumerate(HELDOUT_SEQS):
        make_mini_radarscenes(
            root, seed=200 + i, n_scenes=48, n_objects=4, seq_name=name,
            category="validation",
        )
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from graph_neural_network_for_radar_perception_tpu.config.config import (
        GNNConfig,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        preprocess_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.data.radarscenes import (
        RadarScenesDataset, SequenceCache, build_metadata,
    )
    from graph_neural_network_for_radar_perception_tpu.eval import drivers as D
    from graph_neural_network_for_radar_perception_tpu.infer.pipeline import (
        FrameDetector,
    )
    from graph_neural_network_for_radar_perception_tpu.train.trainer import (
        TrainHooks, train,
    )
    from graph_neural_network_for_radar_perception_tpu.utils.checkpoint import (
        save_params_msgpack,
    )

    t0 = time.time()
    root = build_fixture(tempfile.mkdtemp(prefix="fixture_ds_"))
    cfg = GNNConfig(
        max_nodes=256, max_clusters=128, temporal_window_size=WINDOW,
        batch_size=4, max_train_iter=args.iters, learning_rate=0.01,
    )
    cache = SequenceCache(root, "data", max_sequences=8)
    meta = build_metadata(cache, TRAIN_SEQS, WINDOW)
    ds = RadarScenesDataset(
        cfg, root, meta, augment=cfg.dataset_augmentation, dataset_path="data"
    )
    print(f"fixture: {len(meta)} train windows from {len(TRAIN_SEQS)} "
          f"sequences ({time.time() - t0:.1f}s)", flush=True)

    gen = (
        jax.tree.map(jnp.asarray, b)
        for b in ds.batches(cfg.batch_size, shuffle=True)
    )
    state = train(
        cfg, gen, hooks=TrainHooks(log_period=200, val_period=10**9),
        max_iters=args.iters,
    )
    print(f"trained {int(state.step)} iters ({time.time() - t0:.1f}s)",
          flush=True)

    os.makedirs(args.out, exist_ok=True)
    params = jax.device_get(state.params)
    save_params_msgpack(params, os.path.join(args.out, "weights.msgpack"))
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump(
            {k: v for k, v in dataclasses.asdict(cfg).items()
             if not isinstance(v, (bytes,))},
            f, indent=2, default=str,
        )

    # Per-sequence eval in the reference JSON schema.
    det = FrameDetector(cfg, params, eps=1.4, use_object_head=True)
    seg_dir = os.path.join(args.out, "eval", "semantic_segmentation")
    det_dir = os.path.join(args.out, "eval", "object_classification")
    seg_paths, det_paths = [], []
    rows = []
    for name in TRAIN_SEQS + HELDOUT_SEQS:
        frames, dicts = [], []
        for w in cache.windows(name, WINDOW):
            data = cache.extract_window(name, w)
            dicts.append(data)
            fr = preprocess_frame(data, cfg)
            if fr is not None:
                frames.append(fr)
        seg = D.segmentation_confusion(det, frames)
        seg_paths.append(D.write_sequence_json(seg, seg_dir, name))
        datc = D.evaluate_detection_from_data(
            det, dicts, cluster_size_threshold=1, eps=0.7
        )
        det_paths.append(D.write_sequence_json(datc, det_dir, name))
        seg_acc = (
            np.trace(seg.cm) / seg.cm.sum() if seg.cm.sum() else 0.0
        )
        rows.append((name, len(frames), seg_acc))
        print(f"eval {name}: {len(frames)} frames, "
              f"node-seg acc {seg_acc:.3f}", flush=True)

    classes = list(cfg.object_classes_dyn)
    # aggregate_sequence_jsons returns the precision_recall output.
    seg_pr = D.aggregate_sequence_jsons(seg_paths, cfg.num_classes)
    det_pr = D.aggregate_sequence_jsons(det_paths, cfg.num_classes)

    def table(pr):
        lines = ["| class | precision | recall |", "|---|---|---|"]
        for i, p, r in zip(pr["classes"], pr["precision"], pr["recall"]):
            lines.append(f"| {classes[i]} | {p:.3f} | {r:.3f} |")
        return "\n".join(lines)

    readme = f"""# Fixture-trained artifact corpus

Proof-of-life equivalent of the reference's shipped checkpoint + eval
JSONs (`/root/reference/model_weights/gnn/1718175257362/` +
`/root/reference/performance/*/sequence_*.json`), trained end-to-end on
the deterministic mini-RadarScenes fixture through the real pipeline
(HDF5 windows → stationary gating → SE(2) ego-compensation → ROI +
dynamic filters → kNN graph build → padded batches).

Reproduce: `python scripts/train_fixture_artifact.py` (~{args.iters}
iterations, batch {cfg.batch_size}, SGD m=0.9 with the reference's
MultiStep schedule; sequences 1-4 train, 5-6 held out).

## Semantic segmentation (all 6 sequences, NONE dropped)

{table(seg_pr)}

## Object detection / classification (DBSCAN proposals, 1-IoU assoc.)

{table(det_pr)}

Per-sequence confusion matrices: `eval/semantic_segmentation/*.json`,
`eval/object_classification/*.json` (reference schema:
performance/semantic_segmentation/sequence_108.json).
Weights: `weights.msgpack` (load with
`utils.checkpoint.load_params_msgpack`); exact config: `config.json`.
"""
    with open(os.path.join(args.out, "README.md"), "w") as f:
        f.write(readme)
    print(f"artifact written to {args.out} ({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
