"""GCUPS benchmark harness.

Unit of work (BASELINE.md): DP cells = seq_len * (model_length - 1) per
sequence; GCUPS = cells / second / 1e9. Protocol follows the reference's
best-of-N repetitions (algorithms/benchmark_helper.hpp:8-44) but times
the on-device scan with proper warmup (the reference times JIT + context
creation inside the measured region — SURVEY.md quirk 7 — which we
deliberately do not reproduce; compile happens once, outside timing).

Workloads mirror the reference:
* ``headline``  — 1400.hmm vs random 3500-aa sequences
  (algorithms/benchmark_MSV_1400.cpp), batch widened for TPU;
* ``sweep``     — all 24 profiles vs the same corpus
  (algorithms/benchmark_MSV.cpp).
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Callable

import numpy as np

from ..models.msv import MSVProfile

# BASELINE.md derived anchor: 1 GCUPS scans the reference 1400-profile
# benchmark pass (3 x 3500 aa) in 14.7 ms. The reference publishes no
# measured numbers, so this anchor is the vs_baseline denominator.
BASELINE_GCUPS = 1.0


@dataclasses.dataclass
class BenchResult:
    name: str
    gcups: float
    seconds: float
    cells: int
    batch: int
    seq_len: int
    model_length: int
    repetitions: int
    # per-repetition wall seconds (best-of is `seconds`): recorded so
    # cross-round regressions are attributable to variance vs real change
    # (round-2 verdict: best-of-N-only artifacts made a 10% swing
    # undecidable)
    rep_seconds: list = dataclasses.field(default_factory=list)

    def to_json(self) -> dict:
        d = dataclasses.asdict(self)
        d["rep_seconds"] = [round(s, 6) for s in self.rep_seconds]
        return d


def random_tokens(batch: int, seq_len: int, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Uniform random amino-acid tokens (the reference generator's
    distribution, FASTA_files/random_FASTA_generator.py)."""
    rng = np.random.default_rng(seed)
    tokens = rng.integers(0, 20, size=(batch, seq_len)).astype(np.int32)
    lengths = np.full(batch, seq_len, dtype=np.int32)
    return tokens, lengths


def _sync(out) -> np.ndarray:
    """Force device completion via a host transfer.

    ``block_until_ready`` is not a reliable barrier on relayed/remote
    PJRT backends (observed on the axon TPU tunnel: it returns before
    async compilation/execution finishes); copying the (tiny) score
    vector to host is.
    """
    return np.asarray(out)


def time_scan(
    scan_fn: Callable[[], "object"],
    repetitions: int = 3,
) -> list[float]:
    """Per-repetition wall times of a device scan (syncs on the result).

    Callers take ``min()`` for the best-of-N protocol and keep the full
    list in the JSON artifact so variance stays visible."""
    reps = []
    for _ in range(repetitions):
        t0 = time.perf_counter()
        _sync(scan_fn())
        reps.append(time.perf_counter() - t0)
    return reps


def bench_staged(
    name: str,
    scanner,
    profile: MSVProfile,
    staged,
    repetitions: int = 3,
) -> BenchResult:
    """Time device-resident scans (database staged once — the reference
    sweep shape: one FASTA x many profiles, benchmark_MSV.cpp:32-41)."""

    def run():
        return scanner.scan(profile, staged)

    _sync(run())  # warmup / compile
    reps = time_scan(run, repetitions)
    seconds = min(reps)
    lengths = np.asarray(staged.lengths)[: staged.num_sequences]
    cells = int(lengths.astype(np.int64).sum()) * (profile.model_length - 1)
    return BenchResult(
        name=name,
        gcups=cells / seconds / 1e9,
        seconds=seconds,
        cells=cells,
        batch=staged.num_sequences,
        seq_len=int(lengths.max()) if len(lengths) else 0,
        model_length=profile.model_length,
        repetitions=repetitions,
        rep_seconds=reps,
    )


def bench_profile(
    name: str,
    profile: MSVProfile,
    scan: Callable[[MSVProfile, np.ndarray, np.ndarray], "object"],
    tokens: np.ndarray,
    lengths: np.ndarray,
    repetitions: int = 3,
) -> BenchResult:
    batch, seq_len = tokens.shape

    def run():
        return scan(profile, tokens, lengths)

    _sync(run())  # warmup / compile
    reps = time_scan(run, repetitions)
    seconds = min(reps)
    cells = int(lengths.astype(np.int64).sum()) * (profile.model_length - 1)
    return BenchResult(
        name=name,
        gcups=cells / seconds / 1e9,
        seconds=seconds,
        cells=cells,
        batch=batch,
        seq_len=seq_len,
        model_length=profile.model_length,
        repetitions=repetitions,
        rep_seconds=reps,
    )


def env_fingerprint() -> dict:
    """Environment identity recorded in each bench artifact.

    Cross-round perf swings on the shared remote-TPU tunnel are common
    (round-2's 10% MSV-filter "regression" was tunnel variance); stamping
    the device/runtime identity and wall-clock makes artifacts
    self-documenting when numbers are compared across rounds."""
    import datetime
    import platform

    info = {
        "timestamp_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "hostname": platform.node(),
    }
    try:
        import jax

        dev = jax.devices()[0]
        info["jax_version"] = jax.__version__
        info["device_kind"] = getattr(dev, "device_kind", str(dev))
        info["platform"] = dev.platform
        info["num_devices"] = jax.device_count()
    except Exception as exc:  # pragma: no cover - device probe best-effort
        info["device_error"] = repr(exc)
    return info


def emit_json_line(
    primary: BenchResult,
    extras: list[BenchResult],
    errors: list[str] | None = None,
    detail_path: "str | None" = None,
) -> str:
    """The single JSON line the driver records (BENCH_r{N}.json).

    ``errors`` lists extras that failed and were dropped — recorded so a
    missing stage benchmark is visible in the artifact, not silent.

    The driver archives only the TAIL (~2000 chars) of bench stdout, so
    the full per-rep detail (which outgrew that cap in round 4 — the
    primary row was truncated out of BENCH_r04.json) goes to
    ``detail_path`` and the printed line stays compact: headline metric
    plus a name->GCUPS map of every extra."""
    detail = {
        "primary": primary.to_json(),
        "extras": [e.to_json() for e in extras],
        "errors": errors or [],
        "env": env_fingerprint(),
        "baseline_anchor": "1 GCUPS == 14.7 ms per reference 1400-profile pass (BASELINE.md)",
    }
    payload = {
        "metric": f"GCUPS_M{primary.model_length - 1}",
        "value": round(primary.gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(primary.gcups / BASELINE_GCUPS, 3),
        "extras": {e.name: round(e.gcups, 2) for e in extras},
        "errors": [e[:100] for e in (errors or [])],
    }
    if detail_path is not None:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
        payload["detail_file"] = detail_path
    else:
        payload["detail"] = detail
    return json.dumps(payload)
