"""Hardware validation campaign: every device path vs its NumPy oracle
on the real chip, across all 24 data profiles (docs/PARITY.md records a
run of this). Exits non-zero on any tolerance breach.

    python tools/validate_hw.py [--profiles N] [--p7-every K]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from hmm_fasta_viterbi_tpu import MSVProfile, msv_oracle_batch, parse_hmm
from hmm_fasta_viterbi_tpu.models.p7 import P7Profile
from hmm_fasta_viterbi_tpu.ops.reference import (
    forward_oracle_batch,
    viterbi_oracle_batch,
)
from hmm_fasta_viterbi_tpu.pipeline import MSVScanner

MSV_TOL = 1e-4
FWD_TOL = 2e-3
# Posterior coverage streams alpha rows in BF16 (pallas_posterior module
# docstring): the r4 on-chip campaign measured maxerr 2.111e-3 at
# profile 100 — exactly the documented bf16-stream error class, which
# FWD_TOL (set for the f32 Forward score) sits marginally under. The
# coverage consumer thresholds at 0.5, so 5e-3 still leaves 100x margin.
POST_TOL = 5e-3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--profiles", type=int, default=0, help="0 = all 24")
    ap.add_argument("--p7-every", type=int, default=4,
                    help="run the (slow) p7 oracles every K-th profile")
    ap.add_argument("--seed", type=int, default=123)
    args = ap.parse_args()
    if args.p7_every < 1:
        ap.error("--p7-every must be >= 1")

    sc = MSVScanner()
    rng = np.random.default_rng(args.seed)
    paths = sorted(
        (REPO / "data" / "profile_HMMs").glob("*.hmm"), key=lambda p: int(p.stem)
    )
    if args.profiles:
        paths = paths[: args.profiles]
    if not paths:
        print("no .hmm profiles found", file=sys.stderr)
        return 2

    def err_of(got, want):
        """max abs error with NaN treated as +inf (NaN must FAIL)."""
        e = np.abs(np.asarray(got) - np.asarray(want))
        return float("inf") if np.isnan(e).any() else float(e.max())

    worst = {
        "msv": 0.0, "filter_gap": 0.0, "vit": 0.0, "fwd": 0.0,
        "vfilter_gap": 0.0, "post": 0.0,
    }
    violations = 0
    for k, p in enumerate(paths):
        hmm = parse_hmm(p)
        prof = MSVProfile.from_profile(hmm)
        lengths = np.array([256, 1, 97, 200, 13, 256], dtype=np.int32)
        tokens = rng.integers(0, 20, size=(6, 256)).astype(np.int32)
        staged = sc.stage(tokens, lengths)

        want = msv_oracle_batch(prof, tokens, lengths)
        got = np.asarray(sc.scan(prof, staged))
        e_msv = err_of(got, want)
        worst["msv"] = max(worst["msv"], e_msv)

        approx = np.asarray(sc.scan_filter(prof, staged))
        violations += int(
            np.isnan(approx).sum() + (approx < got - 1e-6).sum()
        )
        worst["filter_gap"] = max(worst["filter_gap"], float((approx - got).max()))

        breach = e_msv > MSV_TOL
        # round 5: the lazy-vs-eager bitwise gate runs on EVERY profile
        # (not just every --p7-every'th) so prepare_p7_device_lazy's
        # auto-K is exercised at all 24 M values on chip — the per-shape
        # verdict cache (_LAZY_HW_VERDICT) is only as good as this sweep
        p7 = P7Profile.from_profile(hmm)
        from hmm_fasta_viterbi_tpu.ops.pallas_p7 import (
            prepare_p7_device_lazy,
            viterbi_pallas,
        )

        auto_k = prepare_p7_device_lazy(p7)[5]
        # round 3: the lazily-certified truncated-chain kernel must
        # be BITWISE equal to the eager full chain ON CHIP (the
        # interpret-mode tests cannot see Mosaic codegen)
        lz = np.asarray(viterbi_pallas(p7, tokens, lengths, lazy=True,
                           hw_fallback=False))
        eg = np.asarray(viterbi_pallas(p7, tokens, lengths, lazy=False))
        lazy_bad = int((lz != eg).sum())
        # round 4: the group-amortized certificate must also be
        # bitwise-exact on chip (its e_max/pd_min relaxation is
        # rounding-order-sensitive by construction)
        gc = np.asarray(
            viterbi_pallas(p7, tokens, lengths, lazy=True,
                           group_cert=True, hw_fallback=False)
        )
        lazy_bad += int((gc != eg).sum())
        violations += lazy_bad
        print(f"    lazy auto-K={auto_k} bitwise "
              + ("OK" if lazy_bad == 0 else f"MISMATCH x{lazy_bad}"),
              flush=True)
        if k % args.p7_every == 0:
            wv = viterbi_oracle_batch(p7, tokens[:3], lengths[:3])
            gv = np.asarray(sc.scan_p7(p7, staged, stage="viterbi"))[:3]
            e_vit = err_of(gv, wv)
            worst["vit"] = max(worst["vit"], e_vit)
            wf = forward_oracle_batch(p7, tokens[:3], lengths[:3])
            gf = np.asarray(sc.scan_p7(p7, staged, stage="forward"))[:3]
            e_fwd = err_of(gf, wf)
            worst["fwd"] = max(worst["fwd"], e_fwd)
            # round 2: upper-bound Viterbi prefilter (zero violations)
            gvf = np.asarray(sc.scan_p7_filter(p7, staged))
            gv_all = np.asarray(sc.scan_p7(p7, staged, stage="viterbi"))
            violations += int(
                np.isnan(gvf).sum() + (gvf < gv_all - 1e-6).sum()
            )
            worst["vfilter_gap"] = max(
                worst["vfilter_gap"], float((gvf - gv_all).max())
            )
            # round 2: two-pass Pallas posterior decode vs lax.scan
            from hmm_fasta_viterbi_tpu.ops.p7_scan import (
                posterior_coverage_batch_xla,
            )
            from hmm_fasta_viterbi_tpu.ops.pallas_posterior import (
                posterior_coverage_batch_pallas,
            )

            pc, pt = posterior_coverage_batch_pallas(p7, tokens[:3], lengths[:3])
            wc, wt = posterior_coverage_batch_xla(p7, tokens[:3], lengths[:3])
            n = min(pc.shape[1], wc.shape[1])
            e_post = max(err_of(pc[:, :n], wc[:, :n]), err_of(pt, wt))
            worst["post"] = max(worst["post"], e_post)
            breach = (
                breach or e_vit > MSV_TOL or e_fwd > FWD_TOL
                or e_post > POST_TOL
            )
        print(
            f"[{k + 1}/{len(paths)}] {p.stem}: "
            + ("TOLERANCE BREACH" if breach else "ok"),
            flush=True,
        )

    # long-sequence drift check (TPU-only failure mode: transcendental
    # bias compounding per residue is invisible to CPU-interpret tests)
    p7 = P7Profile.from_profile(parse_hmm(paths[0]))
    long_l = 36864
    ltok = rng.integers(0, 20, size=(128, long_l)).astype(np.int32)
    llen = np.full(128, long_l, dtype=np.int32)
    lstaged = sc.stage(ltok, llen)
    gv = np.asarray(sc.scan_p7(p7, lstaged, stage="viterbi"))[:1]
    gf = np.asarray(sc.scan_p7(p7, lstaged, stage="forward"))[:1]
    from hmm_fasta_viterbi_tpu.ops.pallas_p7 import forward_pallas

    # referee: the log-space semiring kernel (f32-floor accuracy ~1e-3
    # at this L; the TPU-exp bias bug drifted 4e-2 against it)
    ref = np.asarray(
        forward_pallas(p7, ltok[:1], llen[:1], prob_space=False)
    )
    long_drift = err_of(gf[:1], ref)
    print(f"long-L prob-vs-log forward drift {long_drift:.3e}  (tol 5e-3)")

    print(f"msv maxerr      {worst['msv']:.3e}  (tol {MSV_TOL})")
    print(f"filter gap max  {worst['filter_gap']:.3e}  violations: {violations}")
    print(f"viterbi maxerr  {worst['vit']:.3e}  (tol {MSV_TOL})")
    print(f"forward maxerr  {worst['fwd']:.3e}  (tol {FWD_TOL})")
    print(f"vfilter gap max {worst['vfilter_gap']:.3e}  (bound violations in count above)")
    print(f"posterior maxerr {worst['post']:.3e}  (tol {POST_TOL})")
    ok = (
        worst["msv"] <= MSV_TOL
        and violations == 0
        and worst["vit"] <= MSV_TOL
        and worst["fwd"] <= FWD_TOL
        and worst["post"] <= POST_TOL
        and long_drift <= 5e-3
        and np.all(np.isfinite(gv))
    )
    print("VALIDATION", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
