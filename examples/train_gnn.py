"""Train the flagship radar GNN (script_train_model_gnn.ipynb analog).

Uses RadarScenes if --data-root points at a real dataset, otherwise the
synthetic scene generator.  Run: python examples/train_gnn.py --iters 2000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default=None,
                   help="RadarScenes root (contains <dataset_dir>)")
    p.add_argument("--config", default=None, help="reference-format YAML")
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--out", default="runs/gnn")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--platform", default=None, help="force jax platform")
    args = p.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from graph_neural_network_for_radar_perception_tpu.config.config import (
        GNNConfig,
    )
    from graph_neural_network_for_radar_perception_tpu.data.prefetch import (
        device_prefetch,
    )
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        create_train_state,
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

    cfg = (
        GNNConfig.from_yaml(args.config) if args.config else GNNConfig()
    )
    if args.batch_size:
        cfg.batch_size = args.batch_size
    iters = args.iters or cfg.max_train_iter

    if args.data_root:
        from graph_neural_network_for_radar_perception_tpu.data.radarscenes import (
            RadarScenesDataset, SequenceCache, build_metadata,
            train_val_test_split,
        )

        train_seqs, val_seqs, _ = train_val_test_split(
            args.data_root, cfg.dataset_dir
        )
        cache = SequenceCache(args.data_root, cfg.dataset_dir)
        tmd = build_metadata(cache, train_seqs, cfg.temporal_window_size)
        vmd = build_metadata(cache, val_seqs, cfg.temporal_window_size)
        train_ds = RadarScenesDataset(
            cfg, args.data_root, tmd, augment=cfg.dataset_augmentation
        )
        val_ds = RadarScenesDataset(cfg, args.data_root, vmd)
        train_iter = train_ds.batches(cfg.batch_size)
        val_iter = lambda: val_ds.batches(cfg.batch_size)
    else:
        from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
            SyntheticRadarDataset,
        )

        print("No --data-root: training on synthetic frames")
        cfg.max_nodes, cfg.max_clusters = 512, 256
        train_iter = SyntheticRadarDataset(cfg, seed=cfg.seed).batches(
            cfg.batch_size
        )
        val_iter = lambda: SyntheticRadarDataset(cfg, seed=999).batches(
            cfg.batch_size
        )

    ckpt = CheckpointManager(os.path.join(args.out, "ckpt"))
    state = create_train_state(cfg, jax.random.key(cfg.seed))
    start = 0
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(template=jax.device_get(state))
        start = int(state.step)
        print(f"resumed from step {start}")

    hooks = TrainHooks(
        log_period=100,
        val_period=1000,
        checkpoint=ckpt,
        writer=MetricsWriter(os.path.join(args.out, "logs")),
    )
    train(
        cfg,
        device_prefetch(train_iter),
        val_batches=val_iter,
        hooks=hooks,
        state=state,
        max_iters=iters,
        starting_iter=start,
    )


if __name__ == "__main__":
    main()
