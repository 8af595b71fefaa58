"""In-program microbenchmark of JUST the message-passing trunk.

Times fwd and fwd+bwd of the 7-round MP stack (encoders/heads excluded)
for each implementation, batch 8, N=768 — isolating the gather/scatter
kernel from the rest of the train step so kernel work has a denominator.

Usage: python scripts/microbench_mp.py <impl> [iters]   impl: xla|onehot|csr
Prints: RESULT fwd_ms bwd_ms
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    impl = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from graph_neural_network_for_radar_perception_tpu.config.config import (
        GNNConfig,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset,
    )
    from graph_neural_network_for_radar_perception_tpu.models.blocks import (
        LEAKY_SLOPE,
    )
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        init_params,
    )

    cfg = GNNConfig(max_nodes=768, max_clusters=256)
    ds = SyntheticRadarDataset(cfg, seed=0, num_objects=8)
    batch = jax.tree.map(jnp.asarray, next(ds.batches(8)))
    params = init_params(cfg, jax.random.key(0))
    n = cfg.max_nodes
    rounds = len(cfg.graph_convolution_stem_channels)

    g = batch.graph
    senders = jnp.where(g.edge_mask, g.senders, n).astype(jnp.int32)
    receivers = jnp.where(g.edge_mask, g.receivers, n).astype(jnp.int32)
    key = jax.random.key(1)
    x0 = jax.random.normal(key, (8, n, 64))
    e0 = jax.random.normal(jax.random.key(2), (8, cfg.max_edges, 64))

    def xla_round(x, e, snd, rcv, pb):
        msg0 = pb["MLPStack_0"]["FFNBlock_0"]["Linear_0"]["Dense_0"]
        msg1 = pb["MLPStack_0"]["FFNBlock_1"]["Linear_0"]["Dense_0"]
        from graph_neural_network_for_radar_perception_tpu.ops.norms import (
            channel_norm,
        )

        xs = jnp.take(x, jnp.minimum(snd, n - 1), axis=0)
        xr = jnp.take(x, jnp.minimum(rcv, n - 1), axis=0)
        m = jnp.concatenate([xr, xs, e], axis=-1)
        m = m @ msg0["kernel"] + msg0["bias"]
        m = channel_norm(
            m, pb["MLPStack_0"]["FFNBlock_0"]["ScalarNorm_0"]["gamma"],
            pb["MLPStack_0"]["FFNBlock_0"]["ScalarNorm_0"]["beta"],
        )
        m = jax.nn.leaky_relu(m, LEAKY_SLOPE)
        m = m @ msg1["kernel"] + msg1["bias"]
        m = channel_norm(
            m, pb["MLPStack_0"]["FFNBlock_1"]["ScalarNorm_0"]["gamma"],
            pb["MLPStack_0"]["FFNBlock_1"]["ScalarNorm_0"]["beta"],
        )
        m = jax.nn.leaky_relu(m, LEAKY_SLOPE)
        m = jnp.where((rcv < n)[:, None], m, 0.0)
        return jax.ops.segment_sum(m, rcv, num_segments=n + 1)[:n]

    def trunk(x, e, snd, rcv):
        from graph_neural_network_for_radar_perception_tpu.ops.pallas.csr_mp import (
            fused_message_pass_csr,
        )
        from graph_neural_network_for_radar_perception_tpu.ops.pallas.fused_mp import (
            fused_message_pass,
        )

        for b in range(rounds):
            pb = params["pass_messages"][f"ResidualGraphConvBlock_{b}"]
            msg0 = pb["MLPStack_0"]["FFNBlock_0"]
            msg1 = pb["MLPStack_0"]["FFNBlock_1"]
            w1 = msg0["Linear_0"]["Dense_0"]["kernel"]
            b1 = msg0["Linear_0"]["Dense_0"]["bias"]
            w2 = msg1["Linear_0"]["Dense_0"]["kernel"]
            b2 = msg1["Linear_0"]["Dense_0"]["bias"]
            g1 = msg0["ScalarNorm_0"]["gamma"][0]
            be1 = msg0["ScalarNorm_0"]["beta"][0]
            g2 = msg1["ScalarNorm_0"]["gamma"][0]
            be2 = msg1["ScalarNorm_0"]["beta"][0]
            if impl == "xla":
                agg = xla_round(x, e, snd, rcv, pb)
            elif impl == "onehot":
                agg = fused_message_pass(
                    x, e, snd, rcv, w1, b1, w2, b2, g1, be1, g2, be2,
                    LEAKY_SLOPE, 512, False, False, False,
                )
            else:
                agg = fused_message_pass_csr(
                    x, e, rcv, snd, w1, b1, w2, b2, g1, be1, g2, be2,
                    LEAKY_SLOPE, 512, 256, False, False, False,
                )
            x = x + 0.1 * agg
        return x

    vb = jax.vmap(trunk, in_axes=(0, 0, 0, 0))

    @jax.jit
    def fwd(x, e):
        return jnp.sum(vb(x, e, senders, receivers) ** 2)

    @jax.jit
    def fwdbwd(x, e):
        return jax.grad(lambda xx: fwd(xx, e))(x)

    def timeit(f, *a):
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    t_f = timeit(fwd, x0, e0)
    t_fb = timeit(fwdbwd, x0, e0)
    print(f"RESULT {t_f:.4f} {t_fb:.4f}")


if __name__ == "__main__":
    main()
