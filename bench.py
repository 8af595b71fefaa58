"""Benchmark harness: message-passing training throughput on TPU.

Configs (mirroring BASELINE.json):
  train_b8       batched training step, packed kNN graphs (headline metric)
  stress_dense   radius-union graphs with ~10x edge fanout + 14 rounds
  deploy         deployment forward incl. on-device DBSCAN (frames/s)
  torch_cpu      reference-style gather/scatter baseline (plain torch)

Prints ONE JSON line with the headline metric; details go to stderr.

TIMING METHODOLOGY (round 5 — supersedes every earlier number): on the
tunnelled runtime `jax.block_until_ready` can return BEFORE device
execution completes (a chained scan of 100 8192^3 matmuls "timed" 0.4 ms
against 662 ms of real MXU work), so per-dispatch wall timing measures
the dispatch stream, not the chip; and a blocking scalar readback flips
the session into per-step input re-upload, so readback-per-step
over-reports instead.  The only trustworthy unit is K sequentially-
dependent steps inside ONE compiled lax.scan program, timed end-to-end
including a single readback, at two K values: the slope
(t_K2 - t_K1)/(K2 - K1) cancels RTT, upload, dispatch, and compile-cache
effects.  docs/PERF.md round 5 has the full derivation.

Driver-robustness design (after two rounds of driver timeouts):
  * each TPU subbench runs in ONE fresh subprocess that warms its own
    session (first op = trivial matmul) — no cross-process warm hand-off;
  * the child prints timestamped phase markers (attach / init / compile /
    measure) to stderr so a timeout is diagnosable from the artifact;
  * the child writes each completed measurement to a partial-results
    JSON file; if the child exceeds its budget the parent still reports
    the best completed measurement as a real TPU number;
  * escalating attempt budgets under a global deadline, CPU fallback last.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import tempfile
import time

import numpy as np

T_START = time.perf_counter()
DEADLINE = float(os.environ.get("BENCH_DEADLINE", 2700.0))  # total budget (s)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining() -> float:
    return DEADLINE - (time.perf_counter() - T_START)


def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


ROUNDS = 7
WIDTH = 64
MSG_HIDDEN = 128


def _phase_logger(name: str):
    t0 = time.perf_counter()

    def ph(msg):
        log(f"[{name} +{time.perf_counter() - t0:7.1f}s] {msg}")

    return ph


def _warm_device(ph):
    """First device op: establishes/attaches the axon session.  An idle
    session can take 10-15 MINUTES to establish (815 s measured cold,
    ~52 s per fresh process once warm — docs/PERF.md round 4); doing it
    as the child's own first op removes the round-4 failure mode where a
    separate warmer process 'succeeded' but the measured child still
    timed out."""
    import jax
    import jax.numpy as jnp

    ph(f"jax imported, backend={jax.default_backend()}")
    x = jnp.ones((128, 128))
    jax.block_until_ready(x @ x)
    ph("device attached (first op done)")


def _partial_path():
    return os.environ.get("BENCH_PARTIAL", "")


def _write_partial(payload: dict):
    path = _partial_path()
    if not path:
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def _host_batch(cfg, batch_size, num_objects=8, seed=0, packed=True):
    """Build the batch on the HOST (numpy) so occupancy diagnostics come
    from host arrays — never from a device readback before timing (a
    single input-buffer readback flips the remote session ~40x slower,
    docs/PERF.md round-3 trap #3)."""
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset,
    )

    ds = SyntheticRadarDataset(cfg, seed=seed, num_objects=num_objects)
    gen = (
        ds.packed_batches(batch_size, lookahead=8)
        if packed else ds.batches(batch_size)
    )
    return next(gen)


def _scan_slope(make_prog, make_state, batch, ph, diag, k1, k2, reps=2):
    """True seconds/step: time a K-step scanned program (single dispatch,
    single readback barrier) at K=k1 and K=k2; the slope between them is
    pure per-step device execution (see module docstring).  Each
    completed stage updates the partial-results file, so a parent-side
    timeout still yields a usable (upper-bound) number."""
    times = {}
    for K in (k1, k2):
        prog = make_prog(K)
        state = make_state()
        state, m = prog(state, batch)
        lv = float(m)  # completion barrier (readback)
        ph(f"K={K} program compiled + warm run done (loss={lv:.4f})")
        best = float("inf")
        for _ in range(reps):
            state = make_state()
            t0 = time.perf_counter()
            state, m = prog(state, batch)
            _ = float(m)
            best = min(best, time.perf_counter() - t0)
        times[K] = best
        ph(f"K={K}: {best * 1e3:.1f} ms total ({best / K * 1e3:.3f} ms/step raw)")
        # Raw K-average is an over-estimate (includes RTT+upload) — safe
        # as a partial result.
        _write_partial(dict(diag, ms_per_step=best / K * 1e3, stage=f"K{K}"))
    slope = (times[k2] - times[k1]) / (k2 - k1)
    return slope


def train_b8_config():
    from graph_neural_network_for_radar_perception_tpu.config.config import (
        GNNConfig,
    )

    # Packed-batch headline config: E_cap = 4/3*k*N = 10240 (20 tiles of
    # 512) instead of the 2*k*N worst case — measured kNN frames carry
    # E ≈ 1.25*k*N valid edges, so the tighter capacity plus greedy frame
    # packing (data/pipeline.packed_batches) lifts valid-edge occupancy
    # from ~50 % to ~85 %+ with zero numerics change (per-row norms;
    # tests/test_pipeline_eval.py packing equivalence).
    return GNNConfig(
        max_nodes=768, max_clusters=256, edge_capacity_factor=4 / 3
    )


def bench_train_b8():
    ph = _phase_logger("train_b8")
    _warm_device(ph)
    import jax
    import jax.numpy as jnp

    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        create_train_state, make_train_scan,
    )
    from graph_neural_network_for_radar_perception_tpu.utils.profiling import (
        device_peak_flops, flops_per_train_step,
    )

    cfg = train_b8_config()
    # Varied frame sizes (2-12 objects) mirror real RadarScenes spread
    # and give the packer small frames to fill slot remainders.
    host_batch = _host_batch(cfg, 8, num_objects=(2, 12))
    rounds = len(cfg.graph_convolution_stem_channels)
    cap_edges = 8 * cfg.max_edges * rounds
    valid_edges = float(host_batch.graph.edge_mask.sum()) * rounds
    occupancy = valid_edges / cap_edges
    diag = dict(
        name="train_b8", cap_edges=cap_edges, valid_edges=valid_edges,
        occupancy=occupancy,
    )
    ph(f"host batch built (occupancy {occupancy:.1%})")
    batch = jax.tree.map(jnp.asarray, host_batch)

    def make_state():
        s = create_train_state(cfg, jax.random.key(0))
        jax.block_until_ready(jax.tree.leaves(s.params)[0])
        return s

    # Headline = the production default path (the exact step
    # train/trainer.py runs: XLA model, one-hot MXU segment ops on TPU),
    # measured as the slope of K-step scanned programs — the only timing
    # this runtime cannot fake (module docstring).
    def make_prog(K):
        run = make_train_scan(cfg, K)

        def prog(state, b):
            state, m = run(state, b)
            return state, m["loss_total"]

        return prog

    make_state()
    ph("init done")
    k1, k2 = (2, 6) if os.environ.get("BENCH_FORCE_CPU") else (30, 130)
    dt = _scan_slope(make_prog, make_state, batch, ph, diag, k1, k2)

    flops = flops_per_train_step(cfg, 8)
    tflops = flops / dt / 1e12
    peak = device_peak_flops()
    mfu = f"{flops / dt / peak:.1%}" if peak else "n/a (unknown chip peak)"
    log(
        f"train_b8: {dt * 1e3:.2f} ms/step → "
        f"{valid_edges / dt:.3e} valid-edge-msgs/s at {occupancy:.1%} "
        f"occupancy ({cap_edges / dt:.3e} capacity-edge-msgs/s, "
        f"E_cap={cfg.max_edges}/graph, packed batch)"
    )
    log(f"train_b8: ~{tflops:.1f} TFLOP/s analytic, MFU {mfu}")
    print(json.dumps(dict(diag, ms_per_step=dt * 1e3, stage="slope")))


def bench_stress_dense():
    """Radius-union graphs (~10x fanout) + doubled message-passing depth."""
    ph = _phase_logger("stress_dense")
    _warm_device(ph)
    import jax
    import jax.numpy as jnp

    from graph_neural_network_for_radar_perception_tpu.config.config import (
        GNNConfig,
    )
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        create_train_state,
    )

    cfg = GNNConfig(
        max_nodes=768,
        max_clusters=256,
        ball_query_eps_square=150.0,
        union_ball=True,  # kNN ∪ radius graph: ~10x fanout
        edge_capacity_factor=10,  # E_cap = 10*k*N ≈ 77k edges/graph
        graph_convolution_stem_channels=(64,) * 14,
    )
    host_batch = _host_batch(cfg, 2, num_objects=16, seed=1, packed=False)
    cap_edges = 2 * cfg.max_edges * 14
    valid_e = float(host_batch.graph.edge_mask.sum(-1).mean())
    diag = dict(name="stress_dense", cap_edges=cap_edges, valid_e=valid_e)
    ph("host batch built")
    batch = jax.tree.map(jnp.asarray, host_batch)

    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        make_train_scan,
    )

    def make_state():
        s = create_train_state(cfg, jax.random.key(0))
        jax.block_until_ready(jax.tree.leaves(s.params)[0])
        return s

    # Under true scan-slope timing the default XLA path (one-hot MXU
    # segment ops, 45.2 ms/step) statistically ties the fused Pallas
    # kernel with Pallas backward (43.5) at dense fanout; the round-4
    # "kernel wins stress" numbers were dispatch-stream artifacts
    # (docs/PERF.md round 5 matrix).  Bench the default path.
    def make_prog(K):
        run = make_train_scan(cfg, K)

        def prog(state, b):
            state, m = run(state, b)
            return state, m["loss_total"]

        return prog

    make_state()
    ph("init done")
    k1, k2 = (2, 4) if os.environ.get("BENCH_FORCE_CPU") else (10, 50)
    dt = _scan_slope(make_prog, make_state, batch, ph, diag, k1, k2)
    log(
        f"stress_dense: {dt * 1e3:.2f} ms/step (E_cap={cfg.max_edges}, "
        f"valid E≈{valid_e:.0f}/graph, 14 rounds) → "
        f"{cap_edges / dt:.3e} edge-msgs/s"
    )
    print(json.dumps(dict(diag, ms_per_step=dt * 1e3, stage="slope")))


def bench_deploy():
    ph = _phase_logger("deploy")
    _warm_device(ph)
    import jax
    import jax.numpy as jnp

    from graph_neural_network_for_radar_perception_tpu.config.config import (
        GNNConfig,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset, pad_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.models.gnn import RadarGNN
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        init_params,
    )

    cfg = GNNConfig(max_nodes=768, max_clusters=256)
    ds = SyntheticRadarDataset(cfg, seed=2, num_objects=8)
    g_host, _ = pad_frame(ds.sample_frame(), cfg)
    ph("host frame built")
    params = init_params(cfg, jax.random.key(0))
    g = jax.tree.map(jnp.asarray, g_host)
    model = RadarGNN(cfg)
    ph("init done")

    from functools import partial

    # K deploy forwards inside one scanned program, each frame's input
    # perturbed by the previous frame's output (forced sequential
    # server-side); the K1/K2 slope is true per-frame device time
    # (module docstring — per-dispatch walls are not trustworthy here).
    def make_prog(K):
        @partial(jax.jit, static_argnums=(2,))
        def prog(p, graph, k):
            def body(carry, _):
                gr = dataclasses.replace(
                    graph, node_feat=graph.node_feat + carry
                )
                out = model.apply(
                    {"params": p}, gr, eps=1.4, method=RadarGNN.deploy
                )
                return 0.0 * jnp.sum(out.node_cls), jnp.sum(out.obj_cls)
            c, outs = jax.lax.scan(
                body, jnp.float32(0.0), None, length=k
            )
            return outs[-1]

        return lambda p, graph: prog(p, graph, K)

    diag = dict(name="deploy")
    k1, k2 = (2, 6) if os.environ.get("BENCH_FORCE_CPU") else (40, 200)
    times = {}
    for K in (k1, k2):
        prog = make_prog(K)
        _ = float(prog(params, g))
        ph(f"K={K} deploy program compiled + warm run done")
        best = float("inf")
        for _r in range(2):
            t0 = time.perf_counter()
            _ = float(prog(params, g))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
        ph(f"K={K}: {best * 1e3:.1f} ms total")
        _write_partial(dict(diag, ms_per_frame=best / K * 1e3, stage=f"K{K}"))
    dt = (times[k2] - times[k1]) / (k2 - k1)
    log(
        f"deploy: {dt * 1e3:.2f} ms/frame (incl. on-device DBSCAN, "
        f"scan-slope) → {1 / dt:.1f} frames/s"
    )
    print(json.dumps(dict(diag, ms_per_frame=dt * 1e3, stage="slope")))


def bench_torch(e_cap: int, batch: int = 8):
    """Reference-style message passing in plain torch (CPU): gather →
    MLP([x_i‖x_j‖e]) → index_add scatter per round, fwd+bwd+SGD."""
    import torch

    torch.manual_seed(0)
    N = 768

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.msg = torch.nn.Sequential(
                torch.nn.Linear(3 * WIDTH, MSG_HIDDEN),
                torch.nn.LeakyReLU(0.01),
                torch.nn.Linear(MSG_HIDDEN, WIDTH),
                torch.nn.LeakyReLU(0.01),
            )
            self.upd = torch.nn.Sequential(
                torch.nn.Linear(2 * WIDTH, WIDTH),
                torch.nn.LeakyReLU(0.01),
            )

        def forward(self, x, e, snd, rcv):
            m = self.msg(torch.cat([x[rcv], x[snd], e], dim=-1))
            agg = torch.zeros_like(x).index_add_(0, rcv, m)
            return x + self.upd(torch.cat([x, agg], dim=-1))

    blocks = torch.nn.ModuleList([Block() for _ in range(ROUNDS)])
    opt = torch.optim.SGD(blocks.parameters(), lr=0.005, momentum=0.9)
    xs = [torch.randn(N, WIDTH) for _ in range(batch)]
    es = [torch.randn(e_cap, WIDTH) for _ in range(batch)]
    snd = [torch.randint(0, N, (e_cap,)) for _ in range(batch)]
    rcv = [torch.randint(0, N, (e_cap,)) for _ in range(batch)]

    def step():
        opt.zero_grad()
        total = 0.0
        for b in range(batch):
            x = xs[b]
            for blk in blocks:
                x = blk(x, es[b], snd[b], rcv[b])
            total = total + x.square().mean()
        total.backward()
        opt.step()

    step()
    # Min over iters = capability number, robust to transient host
    # contention.
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    eps = batch * e_cap * ROUNDS / dt
    log(f"torch_cpu: {dt * 1e3:.1f} ms/step → {eps:.3e} edge-msgs/s")
    print(json.dumps({"name": "torch_cpu", "edge_msgs_per_s": eps}))


def _run_subbench(name: str, timeout: float, env_extra=None):
    """Run one config in a fresh process: loading several large
    executables in one process degrades step times ~30-60x on the remote
    TPU tunnel (executable swapping), so each config gets its own
    process and prints a one-line JSON result on stdout.

    Child stderr goes to a temp file that is relayed line-by-line even on
    timeout (phase markers make failures diagnosable from the artifact).
    Returns the parsed result dict, or the partial-results dict with
    ["partial"]=True if the child timed out after completing >=1 window,
    or None."""
    import subprocess

    env = dict(os.environ)
    partial = os.path.join(
        tempfile.gettempdir(), f"bench_partial_{name}_{os.getpid()}.json"
    )
    if os.path.exists(partial):
        os.remove(partial)
    env["BENCH_PARTIAL"] = partial
    if env_extra:
        env.update(env_extra)
    log(f"{name}: attempt with budget {timeout:.0f}s")
    timed_out = False
    with tempfile.TemporaryFile(mode="w+") as errf:
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--sub", name],
                stdout=subprocess.PIPE, stderr=errf, text=True,
                timeout=timeout, env=env,
            )
            out, rc = proc.stdout, proc.returncode
        except subprocess.TimeoutExpired:
            timed_out = True
            out, rc = "", -1
        errf.seek(0)
        for line in errf.read().splitlines():
            if line.startswith(("[", "train_b8", "stress_dense", "deploy",
                                "torch_cpu")):
                log(line)
        if timed_out:
            log(f"{name}: timed out after {timeout:.0f}s")
        elif rc != 0:
            errf.seek(0)
            log(f"{name} failed rc={rc}: "
                f"{errf.read().strip().splitlines()[-3:]}")
    result = None
    if rc == 0:
        try:
            result = json.loads(out.strip().splitlines()[-1])
        except (ValueError, IndexError):
            log(f"{name}: unparsable output {out.strip()[-200:]!r}")
    if result is None and os.path.exists(partial):
        try:
            with open(partial) as f:
                result = dict(json.load(f), partial=True)
            log(f"{name}: using partial result "
                f"(stage {result.get('stage', '?')})")
        except ValueError:
            pass
    if os.path.exists(partial):
        os.remove(partial)
    return result


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--sub":
        if os.environ.get("BENCH_FORCE_CPU"):
            # JAX_PLATFORMS in the env is overridden by the axon
            # sitecustomize's own config.update; this is the one switch
            # that works (CLAUDE.md) — must run before any jax op.
            import jax

            jax.config.update("jax_platforms", "cpu")
        _enable_compile_cache()
        fn = {
            "train_b8": bench_train_b8,
            "stress_dense": bench_stress_dense,
            "deploy": bench_deploy,
            "torch_cpu": lambda: bench_torch(768 * 20),
        }[sys.argv[2]]
        fn()
        return

    # CPU baseline first and alone (heavy host load starves the TPU
    # tunnel relay, and a concurrent warmer could contaminate it —
    # ADVICE round 4); it costs ~15 s.
    base_res = _run_subbench("torch_cpu", timeout=min(300, remaining()))
    base = base_res["edge_msgs_per_s"] if base_res else None

    # TPU headline with escalating budgets.  Attempt 1's budget must
    # cover worst-case session establishment (~815 s) PLUS a cold remote
    # compile (the stress onehot program measured >870 s cold) — the
    # round-4 driver failure is consistent with a 560 s budget killing
    # the child mid-compile twice (nothing reaches the compile cache in
    # that case, so the retry repaid full price).  Partial-result files
    # mean any attempt that finishes >=1 timing window still produces a
    # TPU number even if a later phase stalls.
    platform = (
        "cpu_forced" if os.environ.get("BENCH_FORCE_CPU") else "tpu"
    )
    res = _run_subbench(
        "train_b8", timeout=max(60.0, min(1500.0, remaining() - 500.0))
    )
    if res is None:
        log("train_b8: retrying (completed compiles are now cached)")
        res = _run_subbench(
            "train_b8", timeout=max(60.0, min(1100.0, remaining() - 350.0))
        )
    if res is None:
        log("train_b8: TPU failed twice; CPU-platform fallback "
            "(honest but slow — indicates a wedged TPU session)")
        res = _run_subbench(
            "train_b8", timeout=max(60.0, min(420.0, remaining() - 30.0)),
            env_extra={"BENCH_FORCE_CPU": "1"},
        )
        platform = "cpu_fallback"

    headline = 0.0
    occupancy = cap_eps = None
    if res is not None and "ms_per_step" in res:
        dt = res["ms_per_step"] / 1e3
        headline = res["valid_edges"] / dt
        cap_eps = res["cap_edges"] / dt
        occupancy = res["occupancy"]
        log(
            f"headline: {res['ms_per_step']:.2f} ms/step → "
            f"{headline:.3e} valid-edge-msgs/s "
            f"({occupancy:.1%} occupancy, {cap_eps:.3e} capacity-edge/s)"
            + (" [partial]" if res.get("partial") else "")
        )
    ratio = headline / base if (headline and base) else float("nan")
    # The headline JSON is printed BEFORE the optional stress/deploy
    # subbenches so a driver-side timeout during the extras can never
    # lose the headline; their results go to stderr (the artifact tail).
    print(
        json.dumps({
            "metric": "valid_edge_messages_per_s",
            "value": headline,
            "unit": "edges/s",
            "vs_baseline": ratio,
            "platform": platform,
            "occupancy": occupancy,
            "capacity_edge_messages_per_s": cap_eps,
            "partial": bool(res.get("partial")) if res else None,
        }),
        flush=True,
    )

    # Fold shortened stress/deploy into the default artifact when budget
    # remains (VERDICT r4 #7); BENCH_FULL forces them.
    if res is not None and platform == "tpu" and (
        os.environ.get("BENCH_FULL") or remaining() > 1200
    ):
        for name in ("stress_dense", "deploy"):
            budget = remaining() - 200.0
            if budget < 300 and not os.environ.get("BENCH_FULL"):
                log(f"{name}: skipped (remaining budget {budget:.0f}s)")
                continue
            _run_subbench(name, timeout=max(60.0, min(1100.0, budget)))
    sys.exit(0)


if __name__ == "__main__":
    main()
