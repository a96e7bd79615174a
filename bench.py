"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: training-step throughput (graphs/sec/chip) of the flagship
TGT-At 102M model (24-layer triplet attention, bf16, remat+scan), measured as
full train steps (fwd + bwd + Adam) on one chip, plus pair-entries/sec
(= graphs/sec * N^2, BASELINE.md's edges/s metric).

Inputs vary per step (fresh random batch indices into a pre-staged pool) so a
caching execution layer cannot shortcut repeated steps.

Usage: python bench.py [--small] [--steps N]
"""
import argparse
import functools
import json
import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# ---------------------------------------------------------------------------
# Unkillable-output machinery (VERDICT r2 #1). The driver runs this script
# under `timeout` and parses the LAST JSON line of stdout; round 2 recorded
# nothing because the only print sat after a hang. Defense in depth:
#   1. every milestone prints a provisional, flushed JSON line (last wins);
#   2. a DAEMON-THREAD wall-clock watchdog emits best-so-far JSON and
#      os._exit()s before the driver's kill. A thread, not signal.alarm:
#      the observed hang modes block the MAIN thread inside native jax /
#      tunnel calls, where CPython defers signal handlers indefinitely
#      (measured: SIGTERM from `timeout 30` sat undelivered for minutes);
#   3. SIGTERM handler as a second line for hangs in pure-Python code;
#   4. the stale-TPU-claim retry loop is bounded and raises instead of
#      looping forever, which routes into the same JSON emission.
# ---------------------------------------------------------------------------

_BEST = {
    "metric": "graphs/sec/chip (TGT-At 102M train step)",
    "value": 0.0,
    "unit": "graphs/s",
    "vs_baseline": None,
    "partial": True,
    "stage": "startup",
}


def _emit():
    sys.stdout.write(json.dumps(_BEST) + "\n")
    sys.stdout.flush()


def _update(stage, **kw):
    _BEST["stage"] = stage
    _BEST.update(kw)
    _emit()


def _on_signal(signum, frame):
    _BEST["stage"] = _BEST.get("stage", "") + f"/killed-by-{signum}"
    _emit()
    os._exit(0 if _BEST["value"] else 1)


signal.signal(signal.SIGTERM, _on_signal)

_DEADLINE = [None]  # wall-clock time after which the watchdog fires


def _watchdog():
    while True:
        time.sleep(2)
        dl = _DEADLINE[0]
        if dl is None:
            continue
        if dl == "off":
            return
        if time.time() >= dl:
            _BEST["stage"] = _BEST.get("stage", "") + "/watchdog-timeout"
            _emit()
            os._exit(0 if _BEST["value"] else 1)


def _arm_watchdog(budget_s):
    import threading
    _DEADLINE[0] = time.time() + budget_s
    threading.Thread(target=_watchdog, daemon=True).start()


def _enable_compile_cache():
    """Persistent compilation cache — compiles here go through a remote
    service with high variance (7-10 min for the flagship step); the cache
    makes repeat runs (e.g. the driver's end-of-round bench) start in
    seconds."""
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build(small: bool, dense: bool = False, agx2: bool = False):
    import jax
    import jax.numpy as jnp
    from tgt_tpu.models import TGTConfig, make_model
    from tgt_tpu.schemes.commons import discrete_dist_loss
    from tgt_tpu.training.harness import make_optimizer
    from types import SimpleNamespace

    if agx2:
        # TGT-Agx2 47M-per-stage (configs/pcqm/tgt_agx2_100m/dist_pred/*.yaml;
        # reference encoder.py:80-84 layer_multiplier): 12 layers applied
        # twice each with shared weights, aggregate triplet. The dense
        # aggregate kernel was DEMOTED at round-4 adjudication (core 0.82x,
        # step 83.9 vs 71.1 ms) — the jnp native-dot-order path is the
        # production path for this model.
        cfg = TGTConfig(node_width=768, edge_width=256, num_heads=64,
                        model_height=12, layer_multiplier=2, triplet_heads=16,
                        triplet_type="aggregate", num_dist_bins=256,
                        source_dropout=0.3, drop_path=0.1,
                        node_act_dropout=0.1, edge_act_dropout=0.1,
                        compute_dtype="bfloat16", use_scan=True, remat=True,
                        node_ended=False, edge_ended=True)
        bsz, n = 8, 48
    elif small:
        cfg = TGTConfig(node_width=128, edge_width=64, num_heads=16,
                        model_height=4, triplet_heads=8,
                        triplet_type="attention", num_dist_bins=256,
                        compute_dtype="bfloat16", use_scan=True, remat=True,
                        node_ended=False, edge_ended=True)
        bsz, n = 4, 32
    else:
        # TGT-At 102M (configs/pcqm/tgt_at_200m/dist_pred/*.yaml)
        cfg = TGTConfig(node_width=768, edge_width=256, num_heads=64,
                        model_height=24, triplet_heads=16,
                        triplet_type="attention", num_dist_bins=256,
                        source_dropout=0.3, drop_path=0.2,
                        node_act_dropout=0.1, edge_act_dropout=0.1,
                        compute_dtype="bfloat16", use_scan=True,
                        use_pallas="dense" if dense else False,
                        # remat stays ON with the dense kernel: measured
                        # 153.3 (remat) vs 163.4 ms (no-remat) at b=8 N=48
                        # (campaign_r4 sweep_dense vs sweep_dense_noremat)
                        remat=True,
                        node_ended=False, edge_ended=True)
        bsz, n = 8, 48

    init, apply = make_model("distance")
    params = init(jax.random.PRNGKey(0), cfg)

    opt_cfg = SimpleNamespace(clip_grad_value=None, clip_grad_norm=None)
    opt_init, opt_update = make_optimizer(opt_cfg, None)
    opt_state = jax.jit(opt_init)(params)

    # pre-staged input pool on device; each step gathers a fresh batch by index
    pool = 4 * bsz
    rs = np.random.RandomState(0)
    nodef = np.stack([rs.randint(1, 33, size=(pool, n)) + k * 128
                      for k in range(9)], -1).astype(np.int32)
    featm = np.stack([rs.randint(1, 8, size=(pool, n, n)) + k * 8
                      for k in range(3)], -1).astype(np.int32)
    coords = (rs.randn(pool, n, 3) * 2).astype(np.float32)
    dist = np.linalg.norm(coords[:, :, None] - coords[:, None, :],
                          axis=-1).astype(np.float32)
    pool_data = {
        "node_features": jnp.asarray(nodef),
        "distance_matrix": jnp.asarray(
            rs.randint(0, 30, size=(pool, n, n)).astype(np.int32)),
        "feature_matrix": jnp.asarray(featm),
        "node_mask": jnp.ones((pool, n), jnp.float32),
        "edge_mask": jnp.ones((pool, n, n), jnp.float32),
        "dist_input": jnp.asarray(dist),
    }

    def train_step(params, opt_state, idx, rng):
        batch = {k: v[idx] for k, v in pool_data.items()}

        def loss_fn(p):
            logits = apply(p, batch, cfg, deterministic=False, rng=rng)
            return discrete_dist_loss(logits, batch["dist_input"],
                                      batch["edge_mask"], cfg.num_dist_bins,
                                      8.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = opt_update(grads, opt_state, params,
                                      jnp.asarray(1e-4))
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)
        return new_params, new_opt, loss

    # TGT_COMPILER_OPTIONS='{"xla_tpu_scoped_vmem_limit_kib": 65536}' — XLA
    # compile-option overrides for perf sweeps (client XLA_FLAGS never reach
    # the server-side compiler through the tunnel; compiler_options do)
    copts = os.environ.get("TGT_COMPILER_OPTIONS")
    copts = json.loads(copts) if copts else None
    step = jax.jit(train_step, donate_argnums=(0, 1),
                   compiler_options=copts)
    return step, params, opt_state, bsz, n, pool


# peak bf16 TFLOP/s per chip by device kind (public spec sheets)
_PEAK_TFLOPS = (("v5 lite", 197.0), ("v5e", 197.0), ("v5p", 459.0),
                ("v6e", 918.0), ("v6 lite", 918.0), ("v4", 275.0),
                ("v3", 123.0))


def peak_tflops(device) -> float:
    kind = getattr(device, "device_kind", str(device)).lower()
    for key, val in _PEAK_TFLOPS:
        if key in kind:
            return val
    return 197.0  # default: v5e


def compiled_costs(step, *example_args):
    """(flops, bytes_accessed) of the compiled train step from XLA's cost
    analysis (counts what the device executes, including remat recompute).
    Returns (None, None) if the backend doesn't expose it. bytes_accessed
    is XLA's modeled memory traffic — the basis for the BANDWIDTH roofline,
    which is the binding one for this workload (lane-padded N^3 elementwise
    + layout copies, not matmuls)."""
    try:
        ca = step.lower(*example_args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = ca.get("flops")
        b = ca.get("bytes accessed")
        return (float(f) if f and f > 0 else None,
                float(b) if b and b > 0 else None)
    except Exception:
        return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    # The lane-dense Mosaic triplet kernel is the flagship DEFAULT since the
    # round-4 on-chip adjudication: 153.3 ms/step vs 186.4 baseline at
    # b=8 N=48 (sweep.py, 2026-08-18), 15.84 vs 19.98 ms on the isolated
    # 4-layer core. --baseline measures the pure-XLA conv-emitter path.
    ap.add_argument("--dense", action="store_true",
                    help="(default for the flagship config; kept for "
                         "compatibility with round-3 scripts)")
    ap.add_argument("--baseline", action="store_true",
                    help="disable the dense triplet kernel; measure the "
                         "pure-XLA path")
    ap.add_argument("--agx2", action="store_true",
                    help="bench the second published model: TGT-Agx2 (12x2 "
                         "shared-weight layers, aggregate triplet) instead "
                         "of the TGT-At flagship")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("TGT_BENCH_BUDGET", 1020)),
                    help="wall-clock watchdog (s); emits best-so-far JSON "
                         "and exits when it fires")
    args = ap.parse_args()

    if args.small and args.dense:
        ap.error("--dense applies to the flagship config only (the small "
                 "config's geometry, d*H=64, is not dense-supported)")
    if args.baseline and args.dense:
        ap.error("--baseline and --dense are mutually exclusive")
    if args.agx2 and (args.small or args.dense):
        ap.error("--agx2 is its own model config (and the dense aggregate "
                 "kernel is demoted — measured 0.82x at round 4)")
    dense = not args.small and not args.baseline and not args.agx2
    _arm_watchdog(max(30, int(args.budget)))
    _update("importing-jax")

    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    # Cooperative sequencing vs the measurement campaign (VERDICT r3 #6):
    # the tunnel admits ONE process at a time, and in an outage-recovery
    # window the watcher-launched campaign and the driver's bench.py would
    # otherwise collide. Protocol: the campaign holds
    # /tmp/tgt_tpu_campaign.lock only WHILE one of its steps runs (so the
    # lock clearing means the tunnel is free), and yields to us between
    # steps when it sees our pid file. Campaign-spawned bench runs skip the
    # wait via TGT_CAMPAIGN=1.
    _BENCH_PID_FILE = "/tmp/tgt_tpu_bench.pid"
    try:
        with open(_BENCH_PID_FILE, "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pass
    if os.environ.get("TGT_CAMPAIGN") != "1":
        _CAMPAIGN_LOCK = "/tmp/tgt_tpu_campaign.lock"
        t_lock = time.time()
        while time.time() - t_lock < 900:
            try:
                pid = int(open(_CAMPAIGN_LOCK).read().strip())
                os.kill(pid, 0)  # raises if the holder is gone
            except (OSError, ValueError):
                break
            _update("waiting-for-campaign-lock", campaign_pid=pid)
            time.sleep(20)
        else:
            _update("campaign-lock-wait-expired")  # proceed anyway;
            # the claim-acquire retries below are the second line

    # Fail FAST when the TPU relay itself is down (observed 2026-08-18:
    # 127.0.0.1:8082/:8083 connection-refused for hours; the axon plugin
    # retries the connect internally so jax.devices() hangs forever and
    # only the watchdog would save us — after the whole budget). A TCP
    # probe distinguishes "relay down" (clear error JSON in ~4 min) from
    # "relay up but slow" (proceed; watchdog is the backstop).
    def relay_port_open():
        # BOTH tunnel ports must accept: a half-up relay (8083 open, 8082
        # down) still hangs jax.devices() and would otherwise burn the whole
        # budget before the watchdog fires (shared probe: utils/relay.py)
        from tgt_tpu.utils.relay import relay_ports_open
        return relay_ports_open()

    for attempt in range(8):
        if relay_port_open():
            break
        _update("tpu-relay-port-closed", attempt=attempt + 1)
        time.sleep(30)
    else:
        raise RuntimeError(
            "TPU relay (127.0.0.1:8082/:8083) refused connections for "
            "~4 min — tunnel infrastructure down, not a code failure")

    # the TPU tunnel admits one process at a time; retry (bounded) if another
    # process holds a stale claim, then RAISE so the error-JSON path runs
    # instead of hanging into the driver's timeout
    last_err = None
    for attempt in range(4):
        try:
            _update("acquiring-tpu", attempt=attempt + 1)
            jax.devices()
            last_err = None
            break
        except RuntimeError as exc:
            last_err = exc
            _update("waiting-for-tpu-claim", attempt=attempt + 1)
            time.sleep(40)
    if last_err is not None:
        raise RuntimeError(f"TPU claim never released: {last_err}")
    _update("tpu-acquired", device=str(jax.devices()[0]))

    step, params, opt_state, bsz, n, pool = build(args.small, dense,
                                                  agx2=args.agx2)
    rs = np.random.RandomState(1)
    # baseline of record per model: our round-1 measurements (the reference
    # publishes no throughput numbers — BASELINE.md). At: 37.8 graphs/s;
    # Agx2: 66.0 graphs/s (120 ms/step, CLAUDE.md round 1).
    baseline_gps = None if args.small else (66.0 if args.agx2 else 37.8)

    def one(i):
        idx = jnp.asarray(rs.choice(pool, bsz, replace=False))
        # rbg: same impl the production Trainer uses (cfg.rng_impl);
        # threefry mask generation alone costs ~10 ms/step at this scale
        rng = jax.random.fold_in(jax.random.key(7, impl='rbg'), i)
        return step(params, opt_state, idx, rng)

    if args.agx2:
        metric_name = ("graphs/sec/chip (TGT-Agx2 47M train step, 12x2 "
                       "shared layers, b=%d N=%d, bf16)" % (bsz, n))
    elif args.small:
        metric_name = "graphs/sec/chip (small model, b=%d N=%d)" % (bsz, n)
    else:
        metric_name = ("graphs/sec/chip (TGT-At 102M train step, "
                       "b=%d N=%d, bf16)" % (bsz, n))
    _BEST["metric"] = metric_name

    def record_pass(dt_pass, stage):
        """Provisional result from one timed pass — last JSON line wins, so
        each better measurement overwrites the previous one."""
        gps = args.steps * bsz / dt_pass
        if gps > _BEST["value"]:
            _BEST["value"] = round(gps, 3)
            _BEST["vs_baseline"] = (round(gps / baseline_gps, 3)
                                    if baseline_gps else None)
        _update(stage, unit="graphs/s")

    # warmup / compile
    t0 = time.time()
    params, opt_state, loss = one(0)
    loss.block_until_ready()
    compile_s = time.time() - t0
    _update("compiled", compile_s=round(compile_s, 1))
    t0 = time.time()
    params, opt_state, loss = one(1)
    loss.block_until_ready()
    # even the (slow) second warmup step yields a defensible lower bound:
    # scale its single-step time up to a full pass
    record_pass((time.time() - t0) * args.steps, "warmed")

    # two timed passes, keep the best: the first executions of a fresh
    # executable through the tunnel read slow (CLAUDE.md measurement rule);
    # steady-state throughput is what the soak run confirms end-to-end
    dts = []
    k = 2
    for p in range(2):
        t0 = time.time()
        for i in range(args.steps):
            params, opt_state, loss = one(k)
            k += 1
        loss.block_until_ready()
        dts.append(time.time() - t0)
        record_pass(dts[-1], f"timed-pass-{p + 1}")
    dt = min(dts)
    loss_val = float(loss)

    steps_per_s = args.steps / dt
    graphs_per_s = steps_per_s * bsz
    pair_entries_per_s = graphs_per_s * n * n

    # roofline accounting (VERDICT r1 #9): FLOPs of the compiled step vs the
    # chip's peak -> achieved TFLOP/s and MFU
    idx0 = jnp.asarray(rs.choice(pool, bsz, replace=False))
    flops, bytes_acc = compiled_costs(step, params, opt_state, idx0,
                                      jax.random.key(0, impl='rbg'))
    peak = peak_tflops(jax.devices()[0])
    step_s = dt / args.steps
    achieved_tflops = (flops / step_s / 1e12) if flops else None
    mfu = (achieved_tflops / peak) if achieved_tflops else None
    # bandwidth roofline — the BINDING one here (BASELINE.md "measured vs
    # speed-of-light"): XLA-modeled bytes moved / measured step time vs
    # HBM peak (v5e: 819 GB/s per public spec)
    hbm_peak_gbps = 819.0
    achieved_gbps = (bytes_acc / step_s / 1e9) if bytes_acc else None
    sol_bandwidth = (achieved_gbps / hbm_peak_gbps) if achieved_gbps else None

    result = {
        "metric": metric_name,
        "value": round(graphs_per_s, 3),
        "unit": "graphs/s",
        # the reference publishes no throughput numbers (BASELINE.md), so
        # the baseline of record is our round-1 measurement per model
        # (At 37.8, Agx2 66.0 graphs/s)
        "vs_baseline": (round(graphs_per_s / baseline_gps, 3)
                        if baseline_gps else None),
        "extra": {
            "cache_hit": compile_s < 60.0,
            "pair_entries_per_s": round(pair_entries_per_s, 1),
            "step_ms": round(dt / args.steps * 1000, 2),
            "compile_s": round(compile_s, 1),
            "final_loss": round(loss_val, 4),
            "device": str(jax.devices()[0]),
            "flops_per_step": flops,
            "achieved_tflops": (round(achieved_tflops, 2)
                                if achieved_tflops else None),
            "peak_tflops_bf16": peak,
            "mfu": round(mfu, 4) if mfu else None,
            "bytes_per_step": bytes_acc,
            "achieved_gbps": (round(achieved_gbps, 1)
                              if achieved_gbps else None),
            "hbm_peak_gbps": hbm_peak_gbps,
            "sol_bandwidth": (round(sol_bandwidth, 3)
                              if sol_bandwidth else None),
        },
    }
    _DEADLINE[0] = "off"  # measurement done; don't clip the tail
    _BEST.clear()
    _BEST.update(result)
    _emit()


if __name__ == "__main__":
    try:
        main()
    except BaseException as exc:  # emit a parseable line even on failure
        if isinstance(exc, SystemExit) and not exc.code:
            raise
        _BEST["error"] = f"{type(exc).__name__}: {exc}"[:300]
        _emit()
        raise SystemExit(1)
