"""Long-horizon training demonstration with the full production stack.

Reference analog: modules/neural_net/gnn/training.py:48-186 (the 200k-iter
run behind the README tables), scaled to a synthetic-data demonstration
that exercises every production mechanism end-to-end:

* bucketed static-shape batching feeding the jitted train step
  (train/trainer.py train_bucketed machinery, two bucket shapes);
* state donation, compiled NaN guard, MultiStep LR — both milestones
  (50 %/80 %) are crossed;
* periodic validation + JSONL/TensorBoard scalars + Orbax checkpoints;
* mid-run kill + exact resume: run with --stop-at N first, rerun without
  it — the loop restores params+momentum+step and continues to
  --max-iters;
* post-hoc detection-eval trend: every kept checkpoint is evaluated with
  the deploy-mode FrameDetector (on-device DBSCAN) against held-out
  frames; precision/recall per class land in eval_trend.jsonl, including
  the random-init baseline at step 0.

Run (TPU or CPU):

    python examples/long_training_run.py --run-dir runs/long_run \
        --max-iters 20000 --stop-at 9000        # phase 1: killed mid-run
    python examples/long_training_run.py --run-dir runs/long_run \
        --max-iters 20000                       # phase 2: resume to end
    python examples/long_training_run.py --run-dir runs/long_run \
        --eval-only                             # refresh eval_trend.jsonl
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", default="runs/long_run")
    ap.add_argument("--max-iters", type=int, default=20000)
    ap.add_argument("--stop-at", type=int, default=None,
                    help="simulate a mid-run kill at this iteration")
    ap.add_argument("--val-period", type=int, default=1000)
    ap.add_argument("--pool-batches", type=int, default=256,
                    help="distinct bucketed batches cycled as the train set")
    ap.add_argument("--eval-frames", type=int, default=24)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from graph_neural_network_for_radar_perception_tpu.config.config import (
        GNNConfig,
    )
    from graph_neural_network_for_radar_perception_tpu.data.bucketing import (
        Bucket, bucketed_batches, make_bucketed_train_step,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset,
    )
    from graph_neural_network_for_radar_perception_tpu.data.synthetic import (
        make_synthetic_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        TrainState, create_train_state,
    )
    from graph_neural_network_for_radar_perception_tpu.train.trainer import (
        TrainHooks, train,
    )
    from graph_neural_network_for_radar_perception_tpu.utils.checkpoint import (
        CheckpointManager,
    )
    from graph_neural_network_for_radar_perception_tpu.utils.metrics_writer import (
        MetricsWriter,
    )

    cfg = GNNConfig(
        max_nodes=256, max_clusters=128, temporal_window_size=5,
        batch_size=8, max_train_iter=args.max_iters,
    )
    buckets = [Bucket(128, 64, 16), Bucket(256, 128, 8)]
    run_dir = os.path.abspath(args.run_dir)
    os.makedirs(run_dir, exist_ok=True)
    ckpt = CheckpointManager(
        os.path.join(run_dir, "ckpt"), max_to_keep=64
    )

    # ---- post-hoc checkpoint evaluation (also the --eval-only path) ----
    def eval_trend():
        from graph_neural_network_for_radar_perception_tpu.eval.drivers import (
            evaluate_detection_from_data,
        )
        from graph_neural_network_for_radar_perception_tpu.eval.metrics import (
            precision_recall,
        )
        from graph_neural_network_for_radar_perception_tpu.infer.pipeline import (
            FrameDetector,
        )

        rng = np.random.default_rng(999)
        held_out = [
            make_synthetic_frame(
                rng, num_objects=4, window_size=cfg.temporal_window_size
            )
            for _ in range(args.eval_frames)
        ]
        template = jax.device_get(create_train_state(cfg, jax.random.key(0)))
        steps = [0] + list(ckpt.all_steps())
        path = os.path.join(run_dir, "eval_trend.jsonl")
        with open(path, "w") as f:
            for step in steps:
                if step == 0:
                    params = template.params  # random init baseline
                else:
                    restored = ckpt.restore(step, template=template)
                    if not isinstance(restored, TrainState):
                        restored = TrainState(*restored)
                    params = restored.params
                det = FrameDetector(cfg, jax.tree.map(jnp.asarray, params))
                acc = evaluate_detection_from_data(det, iter(held_out))
                pr = precision_recall(acc.cm)
                prec, rec = pr["precision"], pr["recall"]
                f1 = 2 * prec * rec / np.maximum(prec + rec, 1e-9)
                rec_line = {
                    "step": int(step),
                    "precision": [round(float(p), 4) for p in prec],
                    "recall": [round(float(r), 4) for r in rec],
                    "mean_f1": round(float(f1.mean()), 4),
                }
                f.write(json.dumps(rec_line) + "\n")
                print("eval", rec_line, flush=True)
        return path

    if args.eval_only:
        eval_trend()
        return

    # ---- resume (restore BEFORE the large pool transfers: Orbax restore
    # and bulk device_put interleave badly on the remote TPU runtime) ----
    state = create_train_state(cfg, jax.random.key(cfg.seed))
    starting_iter = 0
    latest = ckpt.latest_step()
    if latest is not None:
        print(f"restoring checkpoint step {latest}...", flush=True)
        restored = ckpt.restore(latest, template=jax.device_get(state))
        if not isinstance(restored, TrainState):
            restored = TrainState(*restored)
        state = jax.tree.map(jnp.asarray, restored)
        starting_iter = int(latest)
        print(f"resumed from checkpoint step {starting_iter}", flush=True)

    # ---- data: a fixed pool of bucketed batches, cycled (keeps the host
    # ahead of the device; the pool is large enough that the model cannot
    # memorise single batches) ----
    ds = SyntheticRadarDataset(cfg, seed=7, num_objects=4)

    def frames():
        while True:
            yield ds.sample_frame()

    print(f"materialising {args.pool_batches} bucketed batches...", flush=True)
    pool = [
        (b, jax.tree.map(jnp.asarray, batch))
        for b, batch in itertools.islice(
            bucketed_batches(frames(), cfg, buckets), args.pool_batches
        )
    ]
    from collections import Counter

    print("bucket mix:", Counter(b.max_nodes for b, _ in pool), flush=True)

    val_ds = SyntheticRadarDataset(cfg, seed=4242, num_objects=4)
    val_pool = [
        jax.tree.map(jnp.asarray, b)
        for b in itertools.islice(val_ds.batches(cfg.batch_size), 4)
    ]

    bstep = make_bucketed_train_step(cfg, buckets, donate=True)

    def step(state, item):
        bucket, batch = item
        return bstep(state, bucket, batch)

    max_iters = (
        min(args.stop_at, args.max_iters) if args.stop_at else args.max_iters
    )
    writer = MetricsWriter(os.path.join(run_dir, "logs"))
    hooks = TrainHooks(
        log_period=200, val_period=args.val_period, num_val_batches=4,
        checkpoint=ckpt, writer=writer,
    )
    state = train(
        cfg,
        itertools.cycle(pool),
        lambda: iter(val_pool),
        hooks=hooks,
        state=state,
        train_step=step,
        max_iters=max_iters,
        starting_iter=starting_iter,
    )
    ckpt.close()
    print(f"finished at step {int(state.step)}", flush=True)
    if not args.stop_at:
        eval_trend()


if __name__ == "__main__":
    main()
