"""sp-axis wavefront scaling evidence on the virtual CPU mesh.

BASELINE.md's multi-host target (>= 80% scaling efficiency) cannot be
measured on this one-chip environment, so this tool builds the paper
trail (VERDICT r1 #9): for each (sp, rows-per-shard) point it

* counts pipeline rounds and the analytic bubble fraction of the
  wavefront (rounds = S + R/g - 1; bubble = (S - 1) / rounds; the
  steady-state efficiency formula R / (S + R - 1) from
  parallel/seqblocks.py);
* sizes the boundary carry that crosses ICI per hop per round
  ((M_pad + 4 specials + position row) * group f32 — KBs, ~zero against
  ICI bandwidth; the pipeline is latency-bound, not bandwidth-bound);
* validates scores against the oracle and measures wall time on the
  8-virtual-device CPU mesh (a functional check + relative-efficiency
  proxy — CPU cores share memory, so absolute times do NOT model ICI).

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/sp_scaling.py
Results are recorded in docs/SP_SCALING.md.
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from hmm_fasta_viterbi_tpu import MSVProfile, msv_oracle_batch, parse_hmm  # noqa: E402
from hmm_fasta_viterbi_tpu.parallel.mesh import make_scan_mesh  # noqa: E402
from hmm_fasta_viterbi_tpu.parallel.seqblocks import msv_scan_seqblocks  # noqa: E402


def main() -> int:
    profile = MSVProfile.from_profile(
        parse_hmm(REPO / "data" / "profile_HMMs" / "100.hmm")
    )
    mr = profile.num_states
    rng = np.random.default_rng(3)
    seq_len = 1024
    group = 1

    print(
        f"# wavefront sp scaling | M={mr} L={seq_len} group={group} "
        f"(8 virtual CPU devices)"
    )
    print(
        "sp  db  rows/shard  rounds  bubble%  eff%(R/(S+R-1))  "
        "carry_KB/hop  wall_ms  ok"
    )
    rows_table = []
    for sp in (1, 2, 4, 8):
        db = 8 // sp
        for rows in (1, 4, 16, 64):
            b = rows * db
            tokens = rng.integers(0, 20, size=(b, seq_len)).astype(np.int32)
            lengths = np.full(b, seq_len, dtype=np.int32)
            lengths[0] = seq_len - 13  # one ragged row crossing blocks
            mesh = make_scan_mesh(db=db, sp=sp)
            want = msv_oracle_batch(profile, tokens, lengths)

            got = msv_scan_seqblocks(profile, tokens, lengths, mesh, group=group)
            ok = bool(np.allclose(got, want, atol=1e-4))
            t0 = time.perf_counter()
            msv_scan_seqblocks(profile, tokens, lengths, mesh, group=group)
            wall = (time.perf_counter() - t0) * 1e3

            rounds = sp + rows // group - 1
            bubble = (sp - 1) / rounds
            eff = rows / (sp + rows - 1)
            # MSVCarry: m [group, mr] + 4 specials [group] (f32)
            carry_kb = (mr + 4) * group * 4 / 1024
            line = (
                f"{sp:<3} {db:<3} {rows:<11} {rounds:<7} "
                f"{100*bubble:<8.1f} {100*eff:<16.1f} "
                f"{carry_kb:<12.2f} {wall:<8.1f} {ok}"
            )
            print(line)
            rows_table.append(
                dict(sp=sp, db=db, rows=rows, rounds=rounds,
                     bubble=bubble, eff=eff, carry_kb=carry_kb,
                     wall_ms=wall, ok=ok)
            )
            assert ok, f"sp={sp} rows={rows} mismatch"
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
