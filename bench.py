"""Benchmark driver: SIR particles/sec/chip at K=1M (BASELINE.json).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

`vs_baseline`: the reference publishes no numbers (BASELINE.md), so the
baseline is a hand-written pure-JAX implementation of the identical SIR
computation (speed-of-light for this workload on this chip).
`vs_baseline = framework_throughput / handwritten_throughput` — 1.0 means
the framework adds zero overhead over hand-written JAX.

Secondary diagnostics (SSM particle filter, HMC chains) go to stderr.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

# BENCH_SMOKE=1: run the ENTIRE flow with tiny shapes on CPU — a
# functional test of the benchmark program itself (JSON contract, every
# diagnostic's code path), not a measurement. tests/test_bench_smoke.py
# runs this in CI so a broken bench.py can't reach the round artifact.
SMOKE = os.environ.get("BENCH_SMOKE", "") not in ("", "0")

K = 20_000 if SMOKE else 1_000_000
# Sweeps scanned inside ONE jit per timed call: large enough that the
# ~25 ms tunnel round trip (subtracted as `t_floor_sir`, but noisy) is
# <2% of the device time being measured.
ITERS = 5 if SMOKE else 50
# Interleaved paired trials for the headline legs (best-of; see main()).
HEADLINE_TRIALS = 2 if SMOKE else 5


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def _force(out):
    """Force completion via a host transfer of one leaf.

    (`block_until_ready` does not reliably wait on the tunneled axon
    backend; a scalar `np.asarray` round-trip does.)"""
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf))


def timeit(fn, *args, iters=ITERS):
    _force(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _force(out)
    return (time.perf_counter() - t0) / iters


def run_diagnostic(name, fn, skips):
    """Run one diagnostic with a single retry (the tunnel drops
    connections mid-benchmark — r4 lost a NUTS row to one transport
    error) and record failures machine-readably instead of silently
    dropping the row."""
    last = None
    for attempt in (1, 2):
        try:
            return fn()
        except Exception as e:  # pragma: no cover
            last = f"{type(e).__name__}: {e}"
            log(f"{name} diagnostic failed (attempt {attempt}/2): {last}")
    skips[name] = last
    return None


def framework_sir():
    """SIR at K=1M through the full framework GFI path; ITERS sweeps are
    scanned inside one jit so device throughput (not dispatch) is
    measured."""
    import genjax_tpu as g
    from genjax_tpu import ChoiceMap
    from genjax_tpu.models.beta_bernoulli import beta_bernoulli

    constraint = ChoiceMap.d({"v": True})

    def one(key):
        k1, k2 = jax.random.split(key)
        keys = jax.random.split(k1, K)
        trs, ws = jax.vmap(beta_bernoulli.importance, in_axes=(0, None, None))(
            keys, constraint, (2.0, 2.0)
        )
        lml = logsumexp(ws) - jnp.log(float(K))
        idx = jax.random.categorical(k2, ws - logsumexp(ws))
        return lml, trs.get_choices()["p"][idx]

    @jax.jit
    def run(keys):
        return jax.lax.scan(lambda c, k: (c, one(k)), None, keys)[1]

    return run


def handwritten_sir(beta_sampler=None):
    """The identical computation, hand-written in raw JAX. The default
    sampler is `jax.random.beta` (what a practitioner writes); pass the
    framework's sampler to isolate GFI overhead from sampler quality."""
    if beta_sampler is None:
        beta_sampler = lambda kk: jax.random.beta(kk, 2.0, 2.0)

    def one(key):
        k1, k2 = jax.random.split(key)
        pkeys = jax.random.split(k1, K)
        p = jax.vmap(beta_sampler)(pkeys)
        ws = jnp.log(p)  # log p(v=True | p)
        lml = logsumexp(ws) - jnp.log(float(K))
        idx = jax.random.categorical(k2, ws - logsumexp(ws))
        return lml, p[idx]

    @jax.jit
    def run(keys):
        return jax.lax.scan(lambda c, k: (c, one(k)), None, keys)[1]

    return run


def _wait_for_device(max_wait_s: float = 1200.0, probe_timeout_s: float = 90.0):
    """Gate on device health before any in-process backend init.

    The tunneled TPU backend can be transiently unavailable (observed:
    multi-hour outages where even a bare matmul hangs); a hung first op
    would eat the caller's entire timeout with no diagnostics. Probe in
    a SUBPROCESS (so a hang is killable), retry with messages, and exit
    nonzero if the device never comes back — an honest fast failure
    beats a silent hang."""
    import subprocess

    probe = (
        "import jax, numpy as np, jax.numpy as jnp; "
        "x = jnp.ones((64, 64)) @ jnp.ones((64, 64)); "
        "print(float(np.asarray(x[0, 0])))"
    )
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=probe_timeout_s,
                capture_output=True,
            )
            if r.returncode == 0:
                if attempt > 1:
                    log(f"device probe: recovered on attempt {attempt}")
                return
            log(f"device probe attempt {attempt}: exit {r.returncode}")
        except subprocess.TimeoutExpired:
            log(f"device probe attempt {attempt}: hung >{probe_timeout_s:.0f}s")
        if time.monotonic() > deadline:
            log(
                f"device unavailable after {max_wait_s:.0f}s of probing; "
                "refusing to hang — no benchmark result produced."
            )
            sys.exit(2)
        time.sleep(30.0)


def main():
    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
        log("BENCH_SMOKE: tiny shapes on CPU — numbers are meaningless")
    else:
        _wait_for_device()
    key = jax.random.key(0)
    backend = jax.default_backend()
    log(f"backend: {backend}, device: {jax.devices()[0]}")

    fw = framework_sir()
    hw = handwritten_sir()
    hw_fast = None
    try:
        from genjax_tpu.distributions.library import _beta_sample

        hw_fast = handwritten_sir(lambda kk: _beta_sample(kk, 2.0, 2.0))
    except Exception as e:  # pragma: no cover
        log("sampler-split setup failed:", e)
    iter_keys = jax.random.split(key, ITERS)

    # Host-sync floor (tunnel round trip per python-level call). Every
    # diagnostic below subtracts it; the headline must too — an
    # unsubtracted ~25 ms floor spread over the in-jit sweeps inflates a
    # ~0.6 ms sweep by ~25/ITERS ms (at the former ITERS=20 that was two
    # thirds of the measurement; at ITERS=50 the residual noise is <2%).
    @jax.jit
    def _tiny_sir(x):
        return jnp.sum(x)

    def _floor_min(n=5):
        """Fastest observed host-sync round trip (min over n calls)."""
        x8 = jnp.arange(8.0)
        _force(_tiny_sir(x8))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            _force(_tiny_sir(x8))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # Headline timing: INTERLEAVED paired best-of-N trials (one call =
    # ITERS in-jit sweeps per trial), the same discipline the roofline
    # probes use. The r4 artifact showed why mean-of-3 per leg is not
    # enough: the tunnel's call-to-call variance (documented ±20%, with
    # occasional multi-ms stalls) landed the committed headline 17%
    # under r3 and gfi_overhead at 1.41x against a 0.89–1.0x documented
    # band. Interleaving makes a stall hit all legs in the same trial;
    # best-of takes each leg's demonstrated speed; min-floor subtraction
    # matches the min-call numerator.
    legs = {"fw": fw, "hw": hw}
    if hw_fast is not None:
        legs["hwf"] = hw_fast
    for fn_ in legs.values():
        _force(fn_(iter_keys))  # compile + warm every leg first
    floor_samples = [_floor_min()]
    samples = {name: [] for name in legs}
    for _ in range(HEADLINE_TRIALS):
        for name, fn_ in legs.items():
            t0 = time.perf_counter()
            _force(fn_(iter_keys))
            samples[name].append(time.perf_counter() - t0)
        floor_samples.append(_floor_min(n=2))
    t_floor_sir = min(floor_samples)
    t_leg = {
        name: max(min(ts) - t_floor_sir, 1e-9) / ITERS
        for name, ts in samples.items()
    }
    for name, ts in samples.items():
        spread = (max(ts) - min(ts)) / min(ts) * 100
        log(
            f"headline leg {name}: best {min(ts)*1e3:.1f} ms / call, "
            f"worst {max(ts)*1e3:.1f} ms (spread {spread:.0f}% over "
            f"{HEADLINE_TRIALS} interleaved trials)"
        )
    t_fw, t_hw = t_leg["fw"], t_leg["hw"]
    pps_fw = K / t_fw
    pps_hw = K / t_hw
    log(f"framework SIR @1M:   {t_fw*1e3:.2f} ms/iter = {pps_fw/1e6:.1f}M particles/s")
    log(f"handwritten SIR @1M: {t_hw*1e3:.2f} ms/iter = {pps_hw/1e6:.1f}M particles/s")
    # Transparency split: hand-written WITH the framework's specialized
    # sampler isolates pure GFI overhead from sampler quality. Both factors
    # are carried into the stdout JSON so the headline `vs_baseline`
    # (their product) cannot be misread as framework overhead.
    gfi_overhead = sampler_speedup = None
    if "hwf" in t_leg:
        t_hwf = t_leg["hwf"]
        gfi_overhead = t_fw / t_hwf
        sampler_speedup = t_hw / t_hwf
        log(
            f"handwritten + framework sampler: {t_hwf*1e3:.2f} ms/iter "
            f"(GFI overhead = {gfi_overhead:.3f}x; sampler speedup = "
            f"{sampler_speedup:.1f}x)"
        )

    # Diagnostics: each runs with one retry (tunnel transport errors) and
    # failures land in `skips` → the stdout JSON, never silently dropped.
    skips: dict = {}
    json_extra: dict = {}
    t_floor = t_floor_sir

    # Roofline: framework log-density throughput vs the device's measured
    # achievable HBM bandwidth (spec sheets overstate what this tunneled
    # part delivers; the copy-chain probe measures reality).
    def _roofline():
        import genjax_tpu as g
        from genjax_tpu import ChoiceMap

        # NN in-jit passes per timed call: the signal must dwarf the
        # ~25-30 ms tunnel floor being subtracted (at NN=200 the whole
        # call was ~34 ms and one slow floor sample could swallow it,
        # yielding nonsense GB/s).
        D, KD, NN = 32, (50_000 if SMOKE else 1_000_000), (20 if SMOKE else 1000)
        ws = jax.random.normal(jax.random.key(9), (KD, D))
        scales = jnp.ones(NN)

        @g.gen
        def dense_model():
            w = g.mv_normal_diag(jnp.zeros(D), jnp.ones(D)) @ "w"
            return w

        @jax.jit
        def density_chain(ws, scales):
            def body(c, s):
                score = jnp.sum(
                    jax.vmap(
                        lambda w: dense_model.assess(ChoiceMap.kw(w=w * s), ())[0]
                    )(ws)
                )
                return c + score, None

            return jax.lax.scan(body, jnp.float32(0), scales)[0]

        @jax.jit
        def read_chain(x):
            # Read-only streaming roof: each iteration re-reads the full
            # array (the carry-dependent shift defeats CSE) and reduces to
            # a scalar — no large writes. A read-only roof upper-bounds
            # any pass that also writes, so the fraction below is <= 1 by
            # construction.
            def body(c, _):
                return c + jnp.sum(jnp.abs(x - c)), None

            return jax.lax.scan(body, jnp.float32(0), None, length=NN)[0]

        # iters=3: a one-shot timing occasionally eats an extra tunnel
        # stall and under-reports by ~1.5x; three iterations average it out.
        flat = ws.reshape(-1)
        # 3 paired trials; BOTH sides take their fastest trial — the
        # demonstrated speed of each pass. Comparing a mean numerator
        # against a best-of denominator (as earlier rounds did) let one
        # slow density sample swing the fraction by ~0.1 run to run; the
        # read-only roof still upper-bounds the read-only density pass by
        # construction, so the fraction stays <= 1 up to timing noise.
        den_ts, roof_ts = [], []
        for _ in range(3):
            den_ts.append(
                max(timeit(density_chain, ws, scales, iters=3) - t_floor, 1e-9) / NN
            )
            roof_ts.append(
                max(timeit(read_chain, flat, iters=3) - t_floor, 1e-9) / NN
            )
        t_den = min(den_ts)
        t_cpy = min(roof_ts)
        # Bytes actually moved, counted the same way on both sides: the
        # density pass reads the K x D weights and fuses the per-particle
        # scores straight into the scalar reduction (no K-length write —
        # verified: the scan body's only carry is one f32), so its traffic
        # is the reads; the roof probe likewise only reads. A read-only
        # roof upper-bounds a read-only pass, so the fraction is <= 1 up
        # to timing noise.
        den_gbs = KD * D * 4 / t_den / 1e9
        probe_gbs = flat.size * 4 / t_cpy / 1e9
        # Both numbers are reported UNCLAMPED and the fraction is taken
        # against the independent read probe, so a byte-accounting mistake
        # in the density pass's traffic model shows up as a fraction > 1
        # instead of being absorbed into a constructed denominator
        # (round-2 verdict/advisor finding). A fraction slightly above 1
        # just means the density pass demonstrated more bandwidth than the
        # probe did in this run.
        frac = den_gbs / probe_gbs
        log(
            f"log-density throughput: {den_gbs:.0f} GB/s; read-only probe "
            f"roof: {probe_gbs:.0f} GB/s; roofline fraction vs probe "
            f"{frac:.2f}"
        )
        if frac > 1.05:
            log(
                f"NOTE: density pass exceeded the probe roof by "
                f"{(frac - 1) * 100:.0f}% — beyond timing noise; check the "
                f"traffic accounting if this persists."
            )

    run_diagnostic("roofline", _roofline, skips)

    # Compute-side roof: achievable bf16 MXU rate on INDEPENDENT 4096^3
    # matmuls (a 64-matrix pool cycled 4x = 256 matmuls per timed call,
    # so the ~180 ms signal dwarfs the +-5 ms tunnel-floor jitter; the
    # |y|-sum consumer defeats XLA's sum(A@B) factorization and DCE).
    # Probe forensics (r4): a CHAINED carry-dependent formulation
    # measures ~29 TFLOP/s — each matmul must drain to HBM before the
    # next starts, a real pipeline cost but not the roof — and earlier
    # small-signal probes (the "40 TFLOP/s" of r2/r3 notes) were
    # floor-noise artifacts. This probe is the denominator for every MFU
    # fraction reported below.
    def _matmul_probe():
        NMM, POOL, CYCLES = (256, 4, 2) if SMOKE else (4096, 64, 4)
        MM_REPS = POOL * CYCLES

        t_floor_mm = _floor_min()
        ka, kb = jax.random.split(jax.random.key(21))
        b_mm = (0.02 * jax.random.normal(kb, (NMM, NMM))).astype(jnp.bfloat16)
        xs_mm = (0.02 * jax.random.normal(ka, (POOL, NMM, NMM))).astype(
            jnp.bfloat16
        )

        @jax.jit
        def mm_indep(xs, b):
            def cycle(c, s):
                def body(c2, x):
                    y = jax.lax.dot_general(
                        x * s, b, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return c2 + jnp.sum(jnp.abs(y)), None

                return jax.lax.scan(body, c, xs)[0], None

            scales = 1.0 + 0.001 * jnp.arange(CYCLES, dtype=jnp.bfloat16)
            return jax.lax.scan(cycle, jnp.float32(0), scales)[0]

        t_mm = max(
            timeit(mm_indep, xs_mm, b_mm, iters=3) - t_floor_mm, 1e-9
        ) / MM_REPS
        roof = 2 * NMM**3 / t_mm / 1e12
        log(
            f"bf16 matmul probe ({NMM}^3 x{MM_REPS} independent): "
            f"{t_mm*1e3:.3f} ms/matmul = {roof:.1f} TFLOP/s "
            f"(measured MXU roof)"
        )
        del xs_mm  # free the 2.1 GB pool before the workload sections

        @jax.jit
        def mm_chain(a, b):
            def body(c, _):
                c = jax.lax.dot_general(
                    c, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.bfloat16,
                )
                return c, None

            return jax.lax.scan(body, a, None, length=MM_REPS)[0]

        a_mm = (0.02 * jax.random.normal(ka, (NMM, NMM))).astype(jnp.bfloat16)
        t_ch = max(
            timeit(mm_chain, a_mm, b_mm, iters=3) - t_floor_mm, 1e-9
        ) / MM_REPS
        log(
            f"bf16 matmul chain (carry-dependent): {t_ch*1e3:.3f} ms/matmul "
            f"= {2 * NMM**3 / t_ch / 1e12:.1f} TFLOP/s (pipeline-stalled — "
            f"sequential-dependence diagnostic, not the roof)"
        )
        return roof

    compute_roof_tflops = run_diagnostic("matmul_probe", _matmul_probe, skips)

    # BASELINE config #3: nonlinear-SSM bootstrap particle filter.
    def _pf():
        from genjax_tpu.models.ssm import run_bootstrap_filter, simulate_ssm_data

        _, ys = simulate_ssm_data(jax.random.key(1), 50)
        # BASELINE config #3 at both 10k and 1M particles. Runs batch
        # inside one jit (scan over keys) with the tunnel round-trip floor
        # subtracted — a per-call timing at 10k particles measures the
        # ~25 ms tunnel, not the ~8 ms filter.
        fields = {}
        pf_configs = (
            ((1_000, 3, "pf_particle_steps_per_s"),
             (10_000, 2, "pf_particle_steps_per_s_1m"))
            if SMOKE
            else ((10_000, 25, "pf_particle_steps_per_s"),
                  (1_000_000, 3, "pf_particle_steps_per_s_1m"))
        )
        for K_pf, reps, field in pf_configs:
            @jax.jit
            def pf_batch(keys, K_pf=K_pf):
                return jax.lax.scan(
                    lambda c, k: (
                        c,
                        run_bootstrap_filter(k, ys, n_particles=K_pf)[0],
                    ),
                    None,
                    keys,
                )[1]

            pf_keys = jax.random.split(jax.random.key(2), reps)
            t_pf = max(timeit(pf_batch, pf_keys, iters=3) - t_floor, 1e-9) / reps
            fields[field] = round(50 * K_pf / t_pf, 1)
            log(
                f"SSM bootstrap PF (T=50, K={K_pf}, systematic): "
                f"{t_pf*1e3:.2f} ms = {50*K_pf/t_pf/1e6:.1f}M particle-steps/s"
            )
        return fields

    json_extra.update(run_diagnostic("pf", _pf, skips) or {})

    def _smc_1m():
        # Full SMC round (init + psum LML + systematic resample +
        # regenerate-rejuvenation) at 1M particles on the device mesh.
        import genjax_tpu as g
        from genjax_tpu import ChoiceMap, Regenerate, Selection, Target
        from genjax_tpu.parallel import ShardedSMC, particle_mesh

        @g.gen
        def conj():
            x = g.normal(0.0, 1.0) @ "x"
            y = g.normal(x, 1.0) @ "y"
            return y

        K_smc = 10_000 if SMOKE else 1_000_000
        mesh = particle_mesh()
        smc = ShardedSMC(n_particles=K_smc, mesh=mesh, ess_threshold=2.0)
        tgt = Target(conj, (), ChoiceMap.kw(y=1.0))

        def smc_round(key):
            col = smc.init(key, tgt)
            lml = smc.lml(col)
            ess0 = smc.ess(col)  # importance-weight ESS this round produced
            col = smc.maybe_resample(jax.random.fold_in(key, 1), col)
            col = smc.rejuvenate(
                jax.random.fold_in(key, 2), col, Regenerate(Selection.at["x"])
            )
            return lml, ess0, jnp.mean(col.get_particles().get_choices()["x"])

        reps_smc = 3 if SMOKE else 20  # ~4.6 ms/round: per-rep floor noise <2%

        @jax.jit
        def smc_batch(keys):
            return jax.lax.scan(lambda c, k: (c, smc_round(k)), None, keys)[1]

        smc_keys = jax.random.split(jax.random.key(5), reps_smc)
        _, ess_vals, _ = smc_batch(smc_keys)
        t_smc = (
            max(timeit(smc_batch, smc_keys, iters=3) - t_floor, 1e-9) / reps_smc
        )
        import numpy as _np

        # BASELINE metric "ESS per wallclock sec": the effective sample
        # size the 1M-particle round's importance weights carry, per
        # second of wallclock for the full round (init + LML + resample +
        # rejuvenate) — i.e. effective posterior samples produced per
        # second, the honest quality-adjusted throughput.
        ess_mean = float(_np.mean(_np.asarray(ess_vals)))
        ess_per_s = ess_mean / t_smc
        log(
            f"SMC full round @{K_smc} particles (init+LML+resample+rejuvenate): "
            f"{t_smc*1e3:.1f} ms = {K_smc/t_smc/1e6:.1f}M particle-rounds/s; "
            f"ESS {ess_mean/1e3:.0f}k/round = {ess_per_s/1e6:.1f}M ESS/s"
        )
        return {
            "ess_per_s": round(ess_per_s, 1),
            "smc_round_particles_per_s": round(K_smc / t_smc, 1),
        }

    json_extra.update(run_diagnostic("smc_1m", _smc_1m, skips) or {})

    def _polyreg():
        # BASELINE config #2: Bayesian polynomial regression — importance
        # sampling + MALA rejuvenation.
        from genjax_tpu.models.polyreg import run_is_mh

        true_coeffs = jnp.array([0.5, -1.0, 0.3])
        xs = jnp.linspace(-2.0, 2.0, 64)
        design = jnp.stack([jnp.ones_like(xs), xs, xs**2], axis=-1)
        ys = design @ true_coeffs + 0.3 * jax.random.normal(
            jax.random.key(11), xs.shape
        )
        reps2 = 3 if SMOKE else 50
        K_pr = 512 if SMOKE else 8192

        @jax.jit
        def polyreg_batch(keys):
            def one(c, k):
                lml, coeffs = run_is_mh(
                    k, xs, ys, n_particles=K_pr, n_rejuvenation=20
                )
                # Consume the rejuvenated coefficients too — otherwise XLA
                # dead-code-eliminates the entire MALA phase.
                return c, (lml, jnp.mean(coeffs, axis=0))

            return jax.lax.scan(one, None, keys)[1]

        pk = jax.random.split(jax.random.key(12), reps2)
        t_pr = max(timeit(polyreg_batch, pk, iters=3) - t_floor, 1e-9) / reps2
        sweeps = K_pr * 20
        log(
            f"polyreg IS(8192)+MALA x20 rejuvenation: {t_pr*1e3:.1f} ms = "
            f"{sweeps/t_pr/1e6:.2f}M rejuvenation-moves/s"
        )

    run_diagnostic("polyreg", _polyreg, skips)

    def _ravi():
        # BASELINE config #5 (stretch): ADEV-trained guide + nested SMC at
        # 1M particles (RAVI). Training runs once (host loop); the timed
        # part is the guided 1M-particle LML estimate.
        from genjax_tpu.models.ravi import nested_smc_lml, train_guide

        params = train_guide(jax.random.key(13), n_steps=5 if SMOKE else 150)
        reps5 = 2 if SMOKE else 20
        K_rv = 10_000 if SMOKE else 1_000_000

        @jax.jit
        def ravi_batch(keys):
            return jax.lax.scan(
                lambda c, k: (c, nested_smc_lml(k, params, K_rv)),
                None,
                keys,
            )[1]

        rk = jax.random.split(jax.random.key(14), reps5)
        lmls = ravi_batch(rk)
        t_rv = max(timeit(ravi_batch, rk, iters=3) - t_floor, 1e-9) / reps5
        exact = -0.5 * 4.0 / 1.25 - 0.5 * jnp.log(2 * jnp.pi * 1.25)
        import numpy as _np

        err = float(jnp.max(jnp.abs(lmls - exact)))
        log(
            f"RAVI nested SMC @1M (ADEV-trained guide): {t_rv*1e3:.1f} ms/estimate "
            f"= {1_000_000/t_rv/1e6:.0f}M particles/s; |LML err| <= {err:.1e}"
        )

    run_diagnostic("ravi", _ravi, skips)

    def _logreg_data():
        from genjax_tpu.models.logreg import simulate_logreg_data

        X, yo, _ = simulate_logreg_data(jax.random.key(3), 256, 16)
        return X, yo

    def _hmc():
        from genjax_tpu.models.logreg import run_hmc_chains

        X, yo = _logreg_data()
        # 50 in-jit reps: at ~1.5 ms/rep, 5 reps left the per-rep number
        # floor-noise dominated (the ~25-30 ms tunnel floor jitters by
        # +-2-4 ms between calls; /5 is +-0.5-0.8 ms on a 1.5 ms signal —
        # one r3 run misreported 0.38 ms/2.9x from exactly this).
        reps_h = 2 if SMOKE else 50
        # ONE config for both sides of the parity ratio.
        eps_h, L_h, S_h, C_h = 0.02, 5, 10, (64 if SMOKE else 8192)

        @jax.jit
        def hmc_batch(keys):
            return jax.lax.scan(
                lambda c, k: (
                    c,
                    jnp.mean(
                        run_hmc_chains(
                            k, X, yo, n_chains=C_h, n_steps=S_h, eps=eps_h, L=L_h
                        )[0]
                    ),
                ),
                None,
                keys,
            )[1]

        hk = jax.random.split(jax.random.key(4), reps_h)
        t_hmc = max(timeit(hmc_batch, hk, iters=3) - t_floor, 1e-9) / reps_h
        steps_per_s = C_h * S_h / t_hmc
        log(
            f"HMC {C_h} chains x {S_h} steps (N=256, D=16, L={L_h}): "
            f"{t_hmc*1e3:.2f} ms = {steps_per_s/1e6:.2f}M chain-steps/s"
        )

        # Hand-written comparator: the identical leapfrog/accept math in
        # raw JAX on the same density (the framework's honest ceiling).

        def logdensity(w):
            logits = X @ w
            return (
                jnp.sum(
                    yo * jax.nn.log_sigmoid(logits)
                    + (1 - yo) * jax.nn.log_sigmoid(-logits)
                )
                - 0.5 * jnp.sum(w * w)
            )

        vg = jax.value_and_grad(logdensity)

        def hmc_step(carry, key):
            (w,) = carry
            k_mom, k_acc = jax.random.split(key)
            p0 = jax.random.normal(k_mom, w.shape)

            def leap(c, _):
                wi, pi, gi = c
                pi = pi + 0.5 * eps_h * gi
                wi = wi + eps_h * pi
                _, gi2 = vg(wi)
                pi = pi + 0.5 * eps_h * gi2
                return (wi, pi, gi2), None

            lp0, g0 = vg(w)
            (w1, p1, _), _ = jax.lax.scan(leap, (w, p0, g0), None, length=L_h)
            # forward-only final density (a tight hand-written HMC needs no
            # gradient here; don't rely on XLA DCE-ing an unused backward)
            lp1 = logdensity(w1)
            alpha = lp1 - lp0 - 0.5 * jnp.sum(p1 * p1) + 0.5 * jnp.sum(p0 * p0)
            accept = jnp.log(jax.random.uniform(k_acc)) < alpha
            return (jnp.where(accept, w1, w),), accept

        def hw_chain(key, w0):
            (w,), _ = jax.lax.scan(
                hmc_step, (w0,), jax.random.split(key, S_h)
            )
            return w

        @jax.jit
        def hw_hmc_batch(keys):
            def one(k):
                k_i, k_r = jax.random.split(k)
                w0 = 0.1 * jax.random.normal(k_i, (C_h, 16))
                ws = jax.vmap(hw_chain)(jax.random.split(k_r, C_h), w0)
                return jnp.mean(ws)

            return jax.lax.scan(lambda c, k: (c, one(k)), None, keys)[1]

        t_hwh = max(timeit(hw_hmc_batch, hk, iters=3) - t_floor, 1e-9) / reps_h
        log(
            f"handwritten HMC same config: {t_hwh*1e3:.2f} ms "
            f"(framework = {t_hwh/t_hmc:.2f}x of hand-written)"
        )
        return {
            "hmc_chain_steps_per_s": round(steps_per_s, 1),
            "hmc_vs_handwritten": round(t_hmc / t_hwh, 4),
        }

    json_extra.update(run_diagnostic("hmc", _hmc, skips) or {})

    # NUTS vs HMC: the fixed-schedule NUTS draw costs 2**max_depth - 1
    # gradient evals; this quantifies that padding trade against HMC's
    # L+1 on the same target (VERDICT r3 item 5).
    def _nuts():
        from genjax_tpu.models.logreg import run_nuts_chains

        X, yo = _logreg_data()
        C_n, S_n = (32, 2) if SMOKE else (8192, 10)
        for md, reps_n in (((4, 1),) if SMOKE else ((6, 10), (8, 3))):

            @jax.jit
            def nuts_batch(keys, md=md):
                return jax.lax.scan(
                    lambda c, k: (
                        c,
                        jnp.mean(
                            run_nuts_chains(
                                k, X, yo, n_chains=C_n, n_steps=S_n,
                                eps=0.02, max_depth=md,
                            )[0]
                        ),
                    ),
                    None,
                    keys,
                )[1]

            nk = jax.random.split(jax.random.key(15 + md), reps_n)
            t_nuts = (
                max(timeit(nuts_batch, nk, iters=3) - t_floor, 1e-9) / reps_n
            )
            grads_per_draw = 2**md - 1
            steps_s = C_n * S_n / t_nuts
            log(
                f"NUTS {C_n} chains x {S_n} draws (max_depth={md}, "
                f"{grads_per_draw} grad evals/draw): {t_nuts*1e3:.2f} ms = "
                f"{steps_s/1e6:.2f}M chain-steps/s, "
                f"{steps_s*grads_per_draw/1e9:.2f}B grad-evals/s"
            )

    run_diagnostic("nuts", _nuts, skips)

    # SVGD: the N x N Stein interaction — one fused kernel contraction
    # per step. Reported with an MFU fraction against the measured bf16
    # matmul roof AND a bandwidth-side traffic model, so whichever roof
    # binds is explicit (VERDICT r3 item 1).
    def _svgd():
        from genjax_tpu.inference.svgd import svgd
        from genjax_tpu.models.logreg import logistic_regression, simulate_logreg_data

        import genjax_tpu as gxx

        fields = {}

        # 2000 in-jit steps: at ~0.03 ms/step the older S=100 gave a
        # ~3 ms signal against a ±3-5 ms tunnel-floor jitter — the same
        # small-signal trap the matmul probe fell into.
        N_sv, D_sv, S_sv, ND_sv = (
            (128, 16, 20, 64) if SMOKE else (4096, 16, 2000, 256)
        )
        Xs, ysv, _ = simulate_logreg_data(jax.random.key(5), ND_sv, D_sv)

        def make_svgd(kd):
            @jax.jit
            def svgd_run(key):
                trs, phi = svgd(
                    key,
                    logistic_regression,
                    (Xs,),
                    gxx.ChoiceMap.kw(ys=ysv),
                    gxx.Selection.at["w"],
                    n_particles=N_sv,
                    n_steps=S_sv,
                    step_size=0.05,
                    kernel_dtype=kd,
                )
                return jnp.mean(trs.get_choices()["w"]), phi[-1]

            return svgd_run

        # Matmul FLOPs per step: the d2 builder (2 N^2 D), the fused
        # [grads | x | 1] contraction (2 N^2 (2D+1)), and the vmapped
        # density grads (~3 passes of the (N, D) x (D, ND) matmul).
        flops_step = (
            2 * N_sv**2 * D_sv
            + 2 * N_sv**2 * (2 * D_sv + 1)
            + 3 * 2 * N_sv * D_sv * ND_sv
        )
        results = {}
        for kd_name, kd in (("f32", None), ("bf16", jnp.bfloat16)):
            t_sv = max(
                timeit(make_svgd(kd), jax.random.key(6), iters=3) - t_floor,
                1e-9,
            )
            per_step = t_sv / S_sv
            results[kd_name] = per_step
            tfl = flops_step / per_step / 1e12
            frac = (
                tfl / compute_roof_tflops if compute_roof_tflops else float("nan")
            )
            # UNFUSED traffic ceiling: 4 n^2 HBM passes at the kernel
            # dtype (distance-dot output written + read by exp, K
            # written + read by the contraction). Measuring BELOW this
            # bound means XLA fused the kernel matrix through VMEM
            # (dot -> exp -> dot), which it does at these shapes —
            # the profiled fused Stein update is ~0.05 ms/step.
            k_bytes = 2 if kd is not None else 4
            traffic = N_sv * N_sv * 4 * k_bytes
            t_bw_pred = traffic / (748e9)
            log(
                f"SVGD[{kd_name}] {N_sv} x {S_sv} steps (logreg N={ND_sv}, "
                f"D={D_sv}): {per_step*1e3:.3f} ms/step = "
                f"{N_sv/per_step/1e6:.1f}M particle-updates/s; "
                f"{tfl:.1f} TFLOP/s = {frac*100:.0f}% of matmul roof; "
                f"unfused traffic ceiling {t_bw_pred*1e3:.3f} ms/step "
                f"(measuring below it = the VMEM kernel fusion landed)"
            )
            if kd_name == "bf16":
                fields["svgd_tflops"] = round(tfl, 2)
                if frac == frac:
                    fields["svgd_fraction"] = round(frac, 4)

        # Lane-filling variant: at D=16 the MXU pads the kernel-matrix
        # contraction 8x (16 -> 128 lanes) and the fused-output columns
        # 4x (33 -> 128), so the D=16 MFU ceiling is structurally ~1/6 of
        # the roof before bandwidth even enters. D=128 fills the lanes —
        # this line demonstrates the same code path's MFU when the model
        # dimension matches the hardware granularity.
        D_big = 128
        Xb, yb, _ = simulate_logreg_data(jax.random.key(7), ND_sv, D_big)

        @jax.jit
        def svgd_big(key):
            trs, phi = svgd(
                key,
                logistic_regression,
                (Xb,),
                gxx.ChoiceMap.kw(ys=yb),
                gxx.Selection.at["w"],
                n_particles=N_sv,
                n_steps=S_sv,
                step_size=0.05,
                kernel_dtype=jnp.bfloat16,
            )
            return jnp.mean(trs.get_choices()["w"]), phi[-1]

        t_big = max(timeit(svgd_big, jax.random.key(8), iters=3) - t_floor, 1e-9)
        per_big = t_big / S_sv
        flops_big = (
            2 * N_sv**2 * D_big
            + 2 * N_sv**2 * (2 * D_big + 1)
            + 3 * 2 * N_sv * D_big * ND_sv
        )
        tfl_big = flops_big / per_big / 1e12
        frac_big = (
            tfl_big / compute_roof_tflops if compute_roof_tflops else float("nan")
        )
        log(
            f"SVGD[bf16] {N_sv} x {S_sv} steps (logreg N={ND_sv}, D={D_big}, "
            f"lane-filling): {per_big*1e3:.3f} ms/step = {tfl_big:.1f} TFLOP/s "
            f"= {frac_big*100:.0f}% of matmul roof"
        )
        fields["svgd_d128_tflops"] = round(tfl_big, 1)
        if frac_big == frac_big:
            fields["svgd_d128_fraction"] = round(frac_big, 4)

        # Lane-PACKED variant at effective D=16: C=8 independent D=16
        # logreg posteriors transported in one joint SVGD (product
        # target, inference/svgd.py::packed_svgd) so the kernel
        # contractions see C*D = 128 lanes — the useful-work answer to
        # the structural ~1/6-roof cap the single-problem D=16 row
        # documents. FLOPs counted are the USEFUL ones (all C problems'
        # transport + grads).
        from genjax_tpu.inference.svgd import packed_svgd

        C_pk = 2 if SMOKE else 8
        pk_data = [
            simulate_logreg_data(jax.random.key(100 + c), ND_sv, D_sv)
            for c in range(C_pk)
        ]

        @jax.jit
        def svgd_packed(key):
            trs, phi = packed_svgd(
                key,
                logistic_regression,
                [(Xc,) for Xc, _, _ in pk_data],
                [gxx.ChoiceMap.kw(ys=yc) for _, yc, _ in pk_data],
                gxx.Selection.at["w"],
                n_particles=N_sv,
                n_steps=S_sv,
                step_size=0.05,
                kernel_dtype=jnp.bfloat16,
            )
            return (
                jnp.stack([t.get_choices()["w"].mean() for t in trs]),
                phi[-1],
            )

        t_pk = max(
            timeit(svgd_packed, jax.random.key(9), iters=3) - t_floor, 1e-9
        )
        per_pk = t_pk / S_sv
        CD = C_pk * D_sv
        flops_pk = (
            2 * N_sv**2 * CD
            + 2 * N_sv**2 * (2 * CD + 1)
            + C_pk * 3 * 2 * N_sv * D_sv * ND_sv
        )
        tfl_pk = flops_pk / per_pk / 1e12
        frac_pk = (
            tfl_pk / compute_roof_tflops if compute_roof_tflops else float("nan")
        )
        log(
            f"SVGD[bf16] PACKED {C_pk} x (D={D_sv}) problems, {N_sv} x "
            f"{S_sv} steps (logreg N={ND_sv}): {per_pk*1e3:.3f} ms/step = "
            f"{tfl_pk:.1f} TFLOP/s = {frac_pk*100:.0f}% of matmul roof "
            f"({C_pk * N_sv / per_pk / 1e6:.1f}M problem-particle-updates/s; "
            f"single-problem D={D_sv} row above is the unpacked baseline)"
        )
        fields["svgd_packed_tflops"] = round(tfl_pk, 1)
        if frac_pk == frac_pk:
            fields["svgd_packed_fraction"] = round(frac_pk, 4)
        return fields

    json_extra.update(run_diagnostic("svgd", _svgd, skips) or {})

    out = {
        "metric": "SIR particles/sec/chip at K=1M",
        "value": round(pps_fw, 1),
        "unit": "particles/s",
        # vs_baseline multiplies two effects; the split fields below keep
        # them separable (vs_baseline ≈ gfi_overhead⁻¹ × sampler_speedup).
        "vs_baseline": round(pps_fw / pps_hw, 4),
    }
    if gfi_overhead is not None:
        out["gfi_overhead"] = round(gfi_overhead, 4)
        out["sampler_speedup"] = round(sampler_speedup, 4)
    if compute_roof_tflops is not None:
        out["compute_roof_tflops"] = round(compute_roof_tflops, 2)
    out.update(json_extra)
    if skips:
        out["skipped"] = skips
    print(json.dumps(out))


if __name__ == "__main__":
    main()
