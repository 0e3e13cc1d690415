#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: GCUPS scanning the reference's flagship workload — the
1400-state profile (algorithms/benchmark_MSV_1400.cpp) against 3500-aa
random sequences — batched for TPU, database staged on device (the
reference sweep shape: one FASTA x many profiles). The 24-profile sweep
(algorithms/benchmark_MSV.cpp equivalent), the bf16 prefilter, the
M=2405 headline, and the Viterbi/Forward stage kernels run by default
(--no-sweep / --no-filter / --no-m2405 / --no-stages to skip); ``--e2e``
adds cold end-to-end (host encode + upload + scan) numbers.

vs_baseline uses BASELINE.md's derived anchor (the reference publishes no
numbers): 1 GCUPS == one 14.7 ms reference benchmark pass.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# persistent compile cache: TPU compiles of the scan kernels are slow
# through the remote-compile tunnel; cache them across bench runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from hmm_fasta_viterbi_tpu import MSVProfile, parse_hmm  # noqa: E402
from hmm_fasta_viterbi_tpu.bench.harness import (  # noqa: E402
    BenchResult,
    bench_profile,
    bench_staged,
    emit_json_line,
    random_tokens,
)
from hmm_fasta_viterbi_tpu.pipeline import MSVScanner, _round_up  # noqa: E402
from hmm_fasta_viterbi_tpu.ops.pallas_msv import LANES, PAD_TOKEN  # noqa: E402


def _probe_child(q):  # top-level: multiprocessing spawn must pickle it
    try:
        import jax

        np.asarray(jax.numpy.ones((8, 8)).sum())
        q.put(True)
    except Exception as e:  # pragma: no cover - defensive
        q.put(f"{type(e).__name__}: {e}")


def device_probe_error(timeout_s: float = 240.0) -> str | None:
    """None when a tiny op completes in a subprocess; else a
    description. When the remote-TPU tunnel is down, jax CLIENT INIT
    HANGS rather than erroring — an unattended bench run would then
    record nothing at all. The probe converts that hang into a JSON
    error line the driver can archive. Skippable: BENCH_SKIP_PROBE=1."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_probe_child, args=(q,), daemon=True)
    p.start()
    p.join(timeout_s)
    if p.is_alive():
        p.terminate()
        p.join(10)
        return f"device probe timed out after {timeout_s:.0f}s (tunnel down?)"
    try:
        ok = q.get(timeout=5)
    except Exception:  # pragma: no cover - defensive
        ok = "probe subprocess died without reporting"
    return None if ok is True else f"device probe failed: {ok}"


def stage_random_device(scanner: MSVScanner, batch: int, seq_len: int):
    """Uniform random tokens generated on device (the reference
    generator's distribution, FASTA_files/random_FASTA_generator.py),
    staged without any host->device transfer."""
    import jax
    import jax.numpy as jnp

    b_pad = _round_up(batch, LANES)
    l_pad = _round_up(seq_len, scanner.l_chunk)
    tok = jax.random.randint(
        jax.random.PRNGKey(0), (l_pad, b_pad), 0, 20, dtype=jnp.int32
    ).astype(jnp.int8)
    lengths = np.zeros(b_pad, dtype=np.int32)
    lengths[:batch] = seq_len
    if l_pad > seq_len:
        # out-of-alphabet pad: emission identity on padded steps
        tok = tok.at[seq_len:].set(PAD_TOKEN)
    if b_pad > batch:
        # pad LANES (length 0) must also hold the pad token — the
        # stage_device contract (ragged real-residue tails corrupt the
        # prob-space Forward kernel)
        tok = tok.at[:, batch:].set(PAD_TOKEN)
    return scanner.stage_device(tok, lengths, num_sequences=batch)


def _substage(scanner: MSVScanner, staged, tokens, lengths, sb: int):
    """Stage the first sb sequences, reusing device data when possible."""
    if tokens is not None:
        return scanner.stage(tokens[:sb], lengths[:sb])
    sb_pad = _round_up(sb, LANES)
    return scanner.stage_device(
        staged.tokens_i8_t[:, :sb_pad],
        np.asarray(staged.lengths)[:sb_pad],
        num_sequences=min(sb, staged.num_sequences),
    )


class _FilterScanner:
    """Adapter: bench_staged -> MSVScanner.scan_filter."""

    def __init__(self, scanner: MSVScanner):
        self._scanner = scanner

    def scan(self, profile, staged):
        return self._scanner.scan_filter(profile, staged)


class _P7StageScanner:
    """Adapter: bench_staged(scanner.scan) -> MSVScanner.scan_p7(stage)."""

    def __init__(self, scanner: MSVScanner, stage: str):
        self._scanner = scanner
        self._stage = stage

    def scan(self, profile, staged):
        return self._scanner.scan_p7(profile, staged, stage=self._stage)


class _P7FilterScanner:
    """Adapter: bench_staged -> MSVScanner.scan_p7_filter (the
    upper-bound Viterbi prefilter kernel)."""

    def __init__(self, scanner: MSVScanner):
        self._scanner = scanner

    def scan(self, profile, staged):
        return self._scanner.scan_p7_filter(profile, staged)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="auto", choices=["auto", "pallas", "xla"])
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--seq-len", type=int, default=3500)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true", help="small batch smoke run")
    ap.add_argument(
        "--no-sweep", dest="sweep", action="store_false", default=True,
        help="skip the 24-profile sweep (benchmark_MSV.cpp equivalent)",
    )
    ap.add_argument("--e2e", action="store_true", help="also time cold end-to-end scans")
    ap.add_argument(
        "--no-stages", dest="stages", action="store_false", default=True,
        help="skip the Viterbi/Forward stage kernel timings (batch/8)",
    )
    ap.add_argument(
        "--no-filter", dest="filter", action="store_false", default=True,
        help="skip the upper-bound bf16 MSV prefilter timing",
    )
    ap.add_argument(
        "--no-m2405", dest="m2405", action="store_false", default=True,
        help="skip the M=2405 headline timing",
    )
    ap.add_argument(
        "--no-cascade", dest="cascade", action="store_false", default=True,
        help="skip the end-to-end search-cascade timing",
    )
    ap.add_argument(
        "--no-oracle", dest="oracle", action="store_false", default=True,
        help="skip the NumPy sequential oracle context row "
        "(Algorithm_selector::seq, benchmark_helper.hpp:6; ~1 s)",
    )
    ap.add_argument(
        "--no-stream", dest="stream_search", action="store_false",
        default=True,
        help="skip the end-to-end streamed search benchmark "
        "(search --stream over a generated corpus, native reader)",
    )
    ap.add_argument(
        "--stream-seqs", type=int, default=16384,
        help="streamed-search corpus size in sequences (x --seq-len "
        "residues each; default 16384 x 3500 = 57 Mres)",
    )
    ap.add_argument(
        "--strict", action="store_true",
        help="fail (nonzero exit) if any extra benchmark errors instead "
        "of recording it in the JSON 'errors' field",
    )
    ap.add_argument(
        "--platform", default=None, choices=["cpu", "axon", "tpu"],
        help="force the jax platform (the axon sitecustomize pins "
        "jax_platforms in every process; a plain JAX_PLATFORMS env var "
        "does NOT override it — this flag does, via jax.config)",
    )
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.quick:
        args.batch = min(args.batch, 128)
        args.reps = 2

    # the probe exists to turn an axon-tunnel hang into an artifact line;
    # a forced CPU run has no tunnel to probe (and must work while the
    # tunnel is down — that's its whole point)
    if args.platform != "cpu" and not os.environ.get("BENCH_SKIP_PROBE"):
        probe_err = device_probe_error()
        if probe_err:
            # one retry: a probe timeout can be transient (tunnel blip,
            # or host CPU contention delaying the subprocess's client
            # init on this 1-CPU box) — a value-0 artifact is costly
            print(f"# probe failed once ({probe_err}); retrying",
                  file=sys.stderr)
            probe_err = device_probe_error()
        if probe_err:
            # emit a well-formed artifact line instead of hanging: value
            # 0 + errors marks "no measurement", not a perf regression
            print(json.dumps({
                "metric": "GCUPS_M1400",
                "value": 0.0,
                "unit": "GCUPS",
                "vs_baseline": 0.0,
                "detail": {"primary": None, "extras": [],
                           "errors": [probe_err]},
            }))
            print(f"# {probe_err}", file=sys.stderr)
            return 1

    scanner = MSVScanner(backend=args.impl)
    print(f"# impl={scanner.backend} batch={args.batch} L={args.seq_len}", file=sys.stderr)

    profile_dir = REPO / "data" / "profile_HMMs"
    if scanner.backend == "pallas" and not args.e2e:
        # generate the random corpus ON DEVICE: uploading a 57 MB batch
        # through the remote-TPU tunnel costs ~75 s of bench wall time
        staged = stage_random_device(scanner, args.batch, args.seq_len)
        tokens = lengths = None
    else:
        tokens, lengths = random_tokens(args.batch, args.seq_len, seed=0)
        staged = scanner.stage(tokens, lengths)

    headline_profile = MSVProfile.from_profile(parse_hmm(profile_dir / "1400.hmm"))
    primary = bench_staged(
        f"headline_1400_{scanner.backend}", scanner, headline_profile, staged, args.reps
    )
    print(f"# headline: {primary.gcups:.2f} GCUPS ({primary.seconds*1e3:.1f} ms)", file=sys.stderr)

    extras: list[BenchResult] = []
    errors: list[str] = []

    def _extra(fn):
        # an extra must never cost the primary metric (remote compiles
        # through the tunnel are slow and uncached; a failure or
        # timeout in one extra should not kill the JSON line) — but a
        # dropped extra is recorded in the JSON 'errors' field so it
        # cannot vanish silently; --strict turns it into a hard failure
        try:
            fn()
        except Exception as e:  # pragma: no cover - defensive
            if args.strict:
                raise
            msg = f"{getattr(fn, '__name__', 'extra')}: {type(e).__name__}: {e}"
            errors.append(msg)
            print(f"# extra failed: {msg}", file=sys.stderr)

    def run_sweep():
        import time as _time

        # bounded batch: the sweep covers 24 profiles, so a 4096-deep
        # database already amortizes dispatch while keeping cold compile time
        # + run time modest
        sb = min(args.batch, 8192)
        sweep_staged = _substage(scanner, staged, tokens, lengths, sb)
        profiles = [
            MSVProfile.from_profile(parse_hmm(path))
            for path in sorted(profile_dir.glob("*.hmm"), key=lambda p: int(p.stem))
        ]
        scanner.scan_many(profiles, sweep_staged)  # warmup / compile per M-bucket
        s_reps = []
        for _ in range(max(args.reps, 2)):
            t0 = _time.perf_counter()
            scanner.scan_many(profiles, sweep_staged)
            s_reps.append(_time.perf_counter() - t0)
        best = min(s_reps)
        sweep_cells = sum(
            int(np.asarray(sweep_staged.lengths)[: sweep_staged.num_sequences].astype(np.int64).sum())
            * (p.model_length - 1)
            for p in profiles
        )
        extras.append(
            BenchResult(
                name=f"sweep24_{scanner.backend}",
                gcups=sweep_cells / best / 1e9,
                seconds=best,
                cells=sweep_cells,
                batch=sweep_staged.num_sequences,
                seq_len=args.seq_len,
                model_length=0,
                repetitions=max(args.reps, 2),
                rep_seconds=s_reps,
            )
        )
        print(
            f"# sweep24: {sweep_cells/best/1e9:.2f} GCUPS over "
            f"{sweep_cells/1e9:.1f} GCells in {best*1e3:.0f} ms",
            file=sys.stderr,
        )
        # per-profile rows (reference prints a best time PER profile plus
        # the sum — benchmark_MSV.cpp:18-23,32-41); these make cross-round
        # per-profile regressions attributable (VERDICT r4 item 5)
        for prof in profiles:
            r = bench_staged(
                f"sweep_p{prof.model_length - 1}_{scanner.backend}",
                scanner, prof, sweep_staged, max(2, min(args.reps, 3)),
            )
            extras.append(r)
        per_rows = [e for e in extras if e.name.startswith("sweep_p")]
        print(
            "# sweep24 per-profile: "
            + " ".join(
                f"{e.model_length - 1}:{e.seconds * 1e3:.0f}ms"
                for e in per_rows
            )
            + f" sum={sum(e.seconds for e in per_rows) * 1e3:.0f}ms",
            file=sys.stderr,
        )
        if scanner.backend == "pallas":
            scanner.scan_many(profiles, sweep_staged, mode="filter")
            f_reps = []
            for _ in range(max(args.reps, 2)):
                t0 = _time.perf_counter()
                scanner.scan_many(profiles, sweep_staged, mode="filter")
                f_reps.append(_time.perf_counter() - t0)
            fbest = min(f_reps)
            extras.append(
                BenchResult(
                    name=f"sweep24_filter_{scanner.backend}",
                    gcups=sweep_cells / fbest / 1e9,
                    seconds=fbest,
                    cells=sweep_cells,
                    batch=sweep_staged.num_sequences,
                    seq_len=args.seq_len,
                    model_length=0,
                    repetitions=max(args.reps, 2),
                    rep_seconds=f_reps,
                )
            )
            print(
                f"# sweep24-filter: {sweep_cells/fbest/1e9:.2f} GCUPS "
                f"in {fbest*1e3:.0f} ms",
                file=sys.stderr,
            )

    if args.sweep:
        _extra(run_sweep)

    def run_filter():
        r = bench_staged(
            f"filter_1400_{scanner.backend}",
            _FilterScanner(scanner),
            headline_profile,
            staged,
            args.reps,
        )
        extras.append(r)
        print(
            f"# filter: {r.gcups:.2f} GCUPS ({r.seconds*1e3:.1f} ms)",
            file=sys.stderr,
        )

    if args.filter and scanner.backend == "pallas":
        _extra(run_filter)

    def run_m2405():
        # BASELINE.md names GCUPS at M=1400 AND M=2405 as the per-chip
        # targets; time the largest profile on a half batch
        p2405 = MSVProfile.from_profile(parse_hmm(profile_dir / "2405.hmm"))
        hb = max(128, args.batch // 2)
        h_staged = _substage(scanner, staged, tokens, lengths, hb)
        r = bench_staged(
            f"headline_2405_{scanner.backend}", scanner, p2405, h_staged, args.reps
        )
        extras.append(r)
        print(
            f"# M2405: {r.gcups:.2f} GCUPS ({r.seconds*1e3:.1f} ms, batch {hb})",
            file=sys.stderr,
        )

    if args.m2405 and scanner.backend == "pallas":
        _extra(run_m2405)

    def run_stages():
        from hmm_fasta_viterbi_tpu.models.p7 import P7Profile

        p7 = P7Profile.from_profile(parse_hmm(profile_dir / "1400.hmm"))
        # batch/4 (r5, was batch/8): at batch 2048 the tunnel's fixed
        # ~36 ms dispatch was 23% of the viterbi row's 156 ms wall —
        # production (cascade) runs these kernels at full staged
        # batches, so the row should amortize the floor the same way
        sb = max(128, args.batch // 4)
        s_staged = _substage(scanner, staged, tokens, lengths, sb)
        for nm in ("viterbi", "forward"):
            r = bench_staged(
                f"{nm}_1400_{scanner.backend}",
                _P7StageScanner(scanner, nm),
                p7,
                s_staged,
                args.reps,
            )
            extras.append(r)
            print(
                f"# {nm}: {r.gcups:.2f} GCUPS ({r.seconds*1e3:.1f} ms, batch {sb})",
                file=sys.stderr,
            )
        if scanner.backend == "pallas":
            r = bench_staged(
                f"viterbi_filter_1400_{scanner.backend}",
                _P7FilterScanner(scanner),
                p7,
                s_staged,
                args.reps,
            )
            extras.append(r)
            print(
                f"# viterbi-filter: {r.gcups:.2f} GCUPS "
                f"({r.seconds*1e3:.1f} ms, batch {sb})",
                file=sys.stderr,
            )

    if args.stages:
        _extra(run_stages)

    def run_cascade():
        # end-to-end hmmsearch-style cascade over a host-staged batch
        # (SearchPipeline needs host tokens for survivor rescoring);
        # GCUPS denominates in MSV cells — the work a plain scan does
        import time as _time

        from hmm_fasta_viterbi_tpu.pipeline import SearchPipeline

        cb = min(args.batch, 4096)
        c_tokens, c_lengths = (
            (tokens[:cb], lengths[:cb])
            if tokens is not None
            else random_tokens(cb, args.seq_len, seed=0)
        )
        c_staged = scanner.stage(c_tokens, c_lengths)
        hmm = parse_hmm(profile_dir / "1400.hmm")
        cells = int(c_lengths.astype(np.int64).sum()) * (
            headline_profile.model_length - 1
        )
        # fused=True is deliberately NOT benched by default: measured a
        # net loss (docs/PERFORMANCE.md "fused single-dispatch cascade")
        # and its compile is expensive
        for label, pipe in (
            ("cascade_1400", SearchPipeline(scanner)),
            (
                "cascade_fast_1400",
                SearchPipeline(scanner, fast_msv=True, fast_viterbi=True),
            ),
        ):
            pipe.search(hmm, c_staged, c_tokens, c_lengths)  # warmup
            c_reps = []
            for _ in range(max(args.reps, 2)):
                t0 = _time.perf_counter()
                pipe.search(hmm, c_staged, c_tokens, c_lengths)
                c_reps.append(_time.perf_counter() - t0)
            best = min(c_reps)
            extras.append(
                BenchResult(
                    name=f"{label}_{scanner.backend}",
                    gcups=cells / best / 1e9,
                    seconds=best,
                    cells=cells,
                    batch=cb,
                    seq_len=args.seq_len,
                    model_length=headline_profile.model_length,
                    repetitions=max(args.reps, 2),
                    rep_seconds=c_reps,
                )
            )
            print(
                f"# {label}: {cells/best/1e9:.2f} GCUPS ({best*1e3:.1f} ms, "
                f"batch {cb})",
                file=sys.stderr,
            )

    if args.cascade and scanner.backend == "pallas":
        _extra(run_cascade)

    def run_posterior():
        # batched forward-backward domain decode (the --domains path):
        # 2 DP passes per cell, reported as decode cells/s
        import time as _time

        from hmm_fasta_viterbi_tpu.models.p7 import P7Profile
        from hmm_fasta_viterbi_tpu.ops.pallas_posterior import (
            posterior_coverage_batch_pallas,
        )

        p7 = P7Profile.from_profile(parse_hmm(profile_dir / "1400.hmm"))
        # production --domains hit-batch shape: the old 128 x 1024 row
        # sat entirely under the tunnel's ~30 ms dispatch floor (a
        # ZERO-time kernel reads <= 6.5 GCUPS there; the plain Forward
        # kernel itself reads 6.66 — docs/PERFORMANCE.md round 4).
        # 1024 hits amortize the floor to ~15%; 512-lane tiles measured
        # best (6.13 vs 5.88 GCUPS at 128 lanes, r4 post sweep)
        pb, pl_len = 1024, 1024
        p_tokens, p_lengths = random_tokens(pb, pl_len, seed=2)
        # hw_fallback=False: a Mosaic rejection must error this row
        # (recorded in the JSON "errors"), not silently time the
        # lax.scan fallback under the pallas row name
        posterior_coverage_batch_pallas(
            p7, p_tokens, p_lengths, hw_fallback=False, lanes=512
        )  # warm
        p_reps = []
        for _ in range(max(args.reps, 2)):
            t0 = _time.perf_counter()
            posterior_coverage_batch_pallas(
                p7, p_tokens, p_lengths, hw_fallback=False, lanes=512
            )
            p_reps.append(_time.perf_counter() - t0)
        best = min(p_reps)
        cells = pb * pl_len * (p7.model_length - 1)
        extras.append(
            BenchResult(
                name=f"posterior_1400_{scanner.backend}",
                gcups=cells / best / 1e9,
                seconds=best,
                cells=cells,
                batch=pb,
                seq_len=pl_len,
                model_length=p7.model_length,
                repetitions=max(args.reps, 2),
                rep_seconds=p_reps,
            )
        )
        print(
            f"# posterior: {cells/best/1e9:.2f} GCUPS decode "
            f"({best*1e3:.1f} ms, batch {pb} x L {pl_len})",
            file=sys.stderr,
        )
        # the production --domains path ships a device-thresholded uint8
        # mask instead of f32 rows (1/4 the transfer; r5) — the row the
        # envelope extractor actually pays for
        posterior_coverage_batch_pallas(
            p7, p_tokens, p_lengths, hw_fallback=False, lanes=512,
            mask_threshold=0.5,
        )  # warm
        m_reps = []
        for _ in range(max(args.reps, 2)):
            t0 = _time.perf_counter()
            posterior_coverage_batch_pallas(
                p7, p_tokens, p_lengths, hw_fallback=False, lanes=512,
                mask_threshold=0.5,
            )
            m_reps.append(_time.perf_counter() - t0)
        mbest = min(m_reps)
        extras.append(
            BenchResult(
                name=f"posterior_mask_1400_{scanner.backend}",
                gcups=cells / mbest / 1e9,
                seconds=mbest,
                cells=cells,
                batch=pb,
                seq_len=pl_len,
                model_length=p7.model_length,
                repetitions=max(args.reps, 2),
                rep_seconds=m_reps,
            )
        )
        print(
            f"# posterior-mask: {cells/mbest/1e9:.2f} GCUPS decode "
            f"({mbest*1e3:.1f} ms, device-thresholded envelope mask)",
            file=sys.stderr,
        )

    if args.stages and scanner.backend == "pallas":
        _extra(run_posterior)

    def run_stream_search():
        # VERDICT r3 #4: the end-to-end streamed path, measured — parse
        # (native reader, background prefetch thread) + encode + stage +
        # full fast cascade, over a generated on-disk corpus. Proves the
        # README streaming claim (parse overlaps device work) with a
        # number instead of a microbenchmark juxtaposition. GCUPS
        # denominates in MSV cells like the cascade rows.
        import tempfile
        import time as _time
        import types

        from hmm_fasta_viterbi_tpu.cli import _stream_search
        from hmm_fasta_viterbi_tpu.io.alphabet import AMINO_ACIDS
        from hmm_fasta_viterbi_tpu.pipeline import SearchPipeline
        from hmm_fasta_viterbi_tpu.runtime.profiling import SectionTimer

        n_seqs = max(4, args.stream_seqs if not args.quick else 64)
        chunk = max(1, min(4096, n_seqs // 4))  # >=4 stream batches
        rng = np.random.default_rng(3)
        letters = np.frombuffer(AMINO_ACIDS.encode(), dtype=np.uint8)
        hmm = parse_hmm(profile_dir / "1400.hmm")
        with tempfile.NamedTemporaryFile(
            "wb", suffix=".fsa", delete=False
        ) as fh:
            corpus_path = fh.name
            wrap = 70
            for i in range(n_seqs):
                fh.write(f">s{i}\n".encode())
                row = letters[rng.integers(0, 20, args.seq_len)].tobytes()
                for off in range(0, len(row), wrap):
                    fh.write(row[off : off + wrap] + b"\n")
        try:
            s_args = types.SimpleNamespace(
                fasta=corpus_path, stream=chunk, loader="auto"
            )
            pipe = SearchPipeline(scanner, fast_msv=True, fast_viterbi=True)
            reps = max(args.reps, 2)
            # untimed warm pass: the cascade's stage kernels + the
            # data-dependent survivor-compaction shapes all compile on
            # first touch; without it 3 reps never reach steady state
            # (r4 campaign best-of-3 read 5.0 GCUPS vs 32.8 warm)
            _stream_search(
                s_args, scanner, pipe, [hmm], keep_tokens=False,
                timer=SectionTimer(),
            )
            best, best_timer, cells = None, None, 0
            s_reps = []
            for _ in range(reps):
                timer = SectionTimer()
                t0 = _time.perf_counter()
                _out, n_total, cells = _stream_search(
                    s_args, scanner, pipe, [hmm], keep_tokens=False,
                    timer=timer,
                )
                dt = _time.perf_counter() - t0
                s_reps.append(dt)
                if best is None or dt < best:
                    best, best_timer = dt, timer
            assert n_total == n_seqs, f"stream lost records: {n_total}"
            host_wait = best_timer.sections.get("prefetch_wait", 0.0)
            extras.append(
                BenchResult(
                    name=f"stream_search_1400_{scanner.backend}",
                    gcups=cells / best / 1e9,
                    seconds=best,
                    cells=cells,
                    batch=chunk,
                    seq_len=args.seq_len,
                    model_length=hmm.model_length,
                    repetitions=reps,
                    rep_seconds=s_reps,
                )
            )
            print(
                f"# stream_search: {cells/best/1e9:.2f} GCUPS e2e over "
                f"{n_seqs} seqs ({best:.2f} s; host parse not hidden by "
                f"device work: {host_wait/best:.0%}; "
                f"phases {best_timer.report()})",
                file=sys.stderr,
            )
        finally:
            os.unlink(corpus_path)

    # backend-agnostic (the CPU/xla smoke covers the machinery between
    # hardware runs); full scale is only reached on the pallas backend
    if args.stream_search:
        _extra(run_stream_search)

    def run_oracle():
        # sequential NumPy oracle throughput for context — the bench
        # path the reference's Algorithm_selector::seq would take
        # (algorithms/benchmark_helper.hpp:6)
        import time as _time

        from hmm_fasta_viterbi_tpu.ops.reference import msv_oracle_batch

        o_tokens, o_lengths = random_tokens(2, args.seq_len, seed=0)
        t0 = _time.perf_counter()
        msv_oracle_batch(headline_profile, o_tokens, o_lengths)
        dt = _time.perf_counter() - t0
        cells = int(o_lengths.astype(np.int64).sum()) * (
            headline_profile.model_length - 1
        )
        extras.append(
            BenchResult(
                name="oracle_msv_numpy",
                gcups=cells / dt / 1e9,
                seconds=dt,
                cells=cells,
                batch=2,
                seq_len=args.seq_len,
                model_length=headline_profile.model_length,
                repetitions=1,
            )
        )
        print(f"# oracle: {cells/dt/1e9:.3f} GCUPS ({dt*1e3:.0f} ms)", file=sys.stderr)

    if args.oracle:
        _extra(run_oracle)

    def _e2e_scan():
        from hmm_fasta_viterbi_tpu.ops.pallas_msv import msv_pallas
        from hmm_fasta_viterbi_tpu.ops.xla_scan import msv_xla

        return msv_pallas if scanner.backend == "pallas" else msv_xla

    def run_ref_b3():
        # the literal reference workload (benchmark_MSV_1400.cpp:8-13:
        # 1400.hmm x 3 sequences x 3500 aa), timed end-to-end including
        # host encode + upload — always recorded so every BENCH artifact
        # carries the reference-pass number
        ref_tokens, ref_lengths = random_tokens(3, 3500, seed=0)
        r = bench_profile(
            f"ref_1400_b3_{scanner.backend}", headline_profile, _e2e_scan(),
            ref_tokens, ref_lengths, args.reps,
        )
        extras.append(r)
        print(
            f"# ref_b3: {r.gcups:.2f} GCUPS ({r.seconds*1e3:.2f} ms; the "
            "reference pass shape)",
            file=sys.stderr,
        )

    _extra(run_ref_b3)

    def run_e2e():
        extras.append(
            bench_profile(
                f"e2e_1400_{scanner.backend}", headline_profile, _e2e_scan(), tokens, lengths, args.reps
            )
        )

    if args.e2e:
        _extra(run_e2e)

    scores = np.asarray(scanner.scan(headline_profile, staged))
    assert np.all(np.isfinite(scores)), "benchmark scan produced non-finite scores"

    # full per-rep detail goes to a file (the driver archives only the
    # tail of stdout; BENCH_r04's primary row was truncated out by the
    # old all-in-one line) — the printed line stays compact
    print(emit_json_line(primary, extras, errors=errors,
                         detail_path=str(REPO / "bench_detail.json")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
