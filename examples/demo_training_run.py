"""Demonstration training run: train the flagship GNN on synthetic radar
scenes and report before/after segmentation+detection metrics.

Produces runs/demo/metrics.jsonl + eval tables; used to generate the
committed artifacts in docs/demo_run/.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def evaluate(cfg, params, n_frames=24, seed=777):
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

    det = FrameDetector(cfg, params, eps=1.4)
    ds = SyntheticRadarDataset(cfg, seed=seed, num_objects=5)
    frames = [ds.sample_frame() for _ in range(n_frames)]
    seg = D.segmentation_confusion(det, frames)
    seg_pr = precision_recall(seg.cm)
    seg_acc = float(np.trace(seg.cm) / max(seg.cm.sum(), 1))

    gen = (
        make_synthetic_frame(
            ds.rng, num_objects=5, window_size=cfg.temporal_window_size
        )
        for _ in range(n_frames)
    )
    detc = D.evaluate_detection_from_data(
        det, gen, cluster_size_threshold=1, eps=0.7
    )
    det_pr = precision_recall(detc.cm)
    classes = [cfg.object_classes_dyn[i] for i in seg_pr["classes"]]
    return {
        "seg_accuracy": seg_acc,
        "classes": classes,
        "seg_precision": seg_pr["precision"].tolist(),
        "seg_recall": seg_pr["recall"].tolist(),
        "det_precision": det_pr["precision"].tolist(),
        "det_recall": det_pr["recall"].tolist(),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10_000)
    p.add_argument("--out", default="runs/demo")
    p.add_argument("--platform", default=None)
    p.add_argument("--skip-before-eval", action="store_true",
                   help="skip the untrained-model eval (saves one deploy "
                        "compile on slow-compiling targets)")
    p.add_argument("--eval-frames", type=int, default=24)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from graph_neural_network_for_radar_perception_tpu.config.config import (
        GNNConfig,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset,
    )
    from graph_neural_network_for_radar_perception_tpu.data.prefetch import (
        device_prefetch, threaded_batches,
    )
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        create_train_state,
    )
    from graph_neural_network_for_radar_perception_tpu.train.trainer import (
        TrainHooks, train,
    )
    from graph_neural_network_for_radar_perception_tpu.utils.metrics_writer import (
        MetricsWriter,
    )

    cfg = GNNConfig(
        max_nodes=512, max_clusters=256, temporal_window_size=5,
        batch_size=8, max_train_iter=args.iters, learning_rate=0.01,
    )
    os.makedirs(args.out, exist_ok=True)

    state = create_train_state(cfg, jax.random.key(cfg.seed))
    if not args.skip_before_eval:
        print("evaluating untrained model...", flush=True)
        before = evaluate(cfg, state.params, n_frames=args.eval_frames)
        json.dump(
            before, open(os.path.join(args.out, "eval_before.json"), "w"),
            indent=2,
        )
        print(f"before: seg acc {before['seg_accuracy']:.3f}")

    def make_iter():
        seed = int.from_bytes(os.urandom(2), "little")
        ds = SyntheticRadarDataset(cfg, seed=seed, num_objects=5)
        return ds.batches(cfg.batch_size)

    batches = device_prefetch(
        threaded_batches(make_iter, num_workers=8, queue_size=16),
        buffer_size=2,
    )
    hooks = TrainHooks(
        log_period=500, val_period=2000, num_val_batches=0,
        writer=MetricsWriter(args.out, use_tensorboard=False),
    )
    t0 = time.time()
    state = train(cfg, batches, hooks=hooks, state=state,
                  max_iters=args.iters)
    wall = time.time() - t0
    print(f"trained {args.iters} iters in {wall:.0f}s "
          f"({args.iters / wall:.1f} it/s)")

    print("evaluating trained model...", flush=True)
    after = evaluate(cfg, state.params, n_frames=args.eval_frames)
    after["train_iters"] = args.iters
    after["wall_s"] = wall
    json.dump(after, open(os.path.join(args.out, "eval_after.json"), "w"),
              indent=2)
    print(f"after: seg acc {after['seg_accuracy']:.3f}")
    for i, name in enumerate(after["classes"]):
        print(
            f"  {name:18s} seg P/R {after['seg_precision'][i] * 100:5.1f}/"
            f"{after['seg_recall'][i] * 100:5.1f}  det P/R "
            f"{after['det_precision'][i] * 100:5.1f}/"
            f"{after['det_recall'][i] * 100:5.1f}"
        )

    from graph_neural_network_for_radar_perception_tpu.utils.checkpoint import (
        save_params_msgpack,
    )

    save_params_msgpack(state.params, os.path.join(args.out, "params.msgpack"))


if __name__ == "__main__":
    main()
