"""Segmentation + detection evaluation (performance_eval_*.ipynb analog):
per-sequence confusion JSONs and aggregated precision/recall tables.

Run: python examples/evaluate.py --ckpt runs/gnn/ckpt --frames 50
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    p.add_argument("--torch-ckpt", default=None,
                   help="reference graph_based_detector.pt")
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--out", default="runs/eval")
    p.add_argument("--eps", type=float, default=1.4)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from graph_neural_network_for_radar_perception_tpu.config.config import (
        GNNConfig,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset,
    )
    from graph_neural_network_for_radar_perception_tpu.data.synthetic import (
        make_synthetic_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.eval import drivers as D
    from graph_neural_network_for_radar_perception_tpu.eval.metrics import (
        precision_recall,
    )
    from graph_neural_network_for_radar_perception_tpu.infer.pipeline import (
        FrameDetector,
    )
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        create_train_state, init_params,
    )

    cfg = GNNConfig(max_nodes=512, max_clusters=256, temporal_window_size=5)
    params = init_params(cfg, jax.random.key(0))
    if args.torch_ckpt:
        from graph_neural_network_for_radar_perception_tpu.utils.torch_import import (
            load_reference_checkpoint,
        )

        params = load_reference_checkpoint(params, args.torch_ckpt)
        print(f"loaded reference checkpoint {args.torch_ckpt}")
    elif args.ckpt:
        from graph_neural_network_for_radar_perception_tpu.utils.checkpoint import (
            CheckpointManager,
        )

        mgr = CheckpointManager(args.ckpt)
        state = mgr.restore(
            template=jax.device_get(create_train_state(cfg, jax.random.key(0)))
        )
        params = state.params
        print(f"loaded step {mgr.latest_step()} from {args.ckpt}")

    det = FrameDetector(cfg, params, eps=args.eps)
    ds = SyntheticRadarDataset(cfg, seed=1234, num_objects=4)

    # segmentation
    frames = [ds.sample_frame() for _ in range(args.frames)]
    seg = D.segmentation_confusion(det, frames)
    path = D.write_sequence_json(seg, args.out, "sequence_synthetic")
    pr = D.aggregate_sequence_jsons([path], cfg.num_classes)
    names = [cfg.object_classes_dyn[i] for i in pr["classes"]]
    print("\nSemantic segmentation (precision / recall):")
    for n, p_, r in zip(names, pr["precision"], pr["recall"]):
        print(f"  {n:18s} {p_ * 100:5.1f}% / {r * 100:5.1f}%")

    # detection
    gen = (
        make_synthetic_frame(
            ds.rng, num_objects=4, window_size=cfg.temporal_window_size
        )
        for _ in range(args.frames)
    )
    detc = D.evaluate_detection_from_data(
        det, gen, cluster_size_threshold=1, eps=0.7
    )
    prd = precision_recall(detc.cm)
    print("\nObject detection (precision / recall):")
    for n, p_, r in zip(names, prd["precision"], prd["recall"]):
        print(f"  {n:18s} {p_ * 100:5.1f}% / {r * 100:5.1f}%")


if __name__ == "__main__":
    main()
