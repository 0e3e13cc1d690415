#!/usr/bin/env python
"""A/B the truncated prob-space delete chain (round 3) on hardware.

Times the Forward kernel with the auto-picked window vs the full chain
and checks score agreement (the truncation bound: < 1e-9 relative; see
ops.pallas_p7.pick_prob_chain_window). Also times the posterior decode
both ways at a hit-sized batch.

Run on TPU: python tools/fwd_chain_ab.py [--batch 2048] [--m 1400]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax.numpy as jnp  # noqa: E402

from hmm_fasta_viterbi_tpu import parse_hmm  # noqa: E402
from hmm_fasta_viterbi_tpu.models.p7 import P7Profile  # noqa: E402
from hmm_fasta_viterbi_tpu.models.msv import length_transitions  # noqa: E402
from hmm_fasta_viterbi_tpu.ops import pallas_p7 as pp  # noqa: E402
from hmm_fasta_viterbi_tpu.ops import pallas_posterior as post  # noqa: E402


def timeit(fn, reps):
    np.asarray(fn())
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        out.append(time.perf_counter() - t0)
    return min(out), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--seq-len", type=int, default=3500)
    ap.add_argument("--m", default="1400")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--post-batch", type=int, default=128)
    ap.add_argument("--post-len", type=int, default=1024)
    args = ap.parse_args()

    p7 = P7Profile.from_profile(
        parse_hmm(REPO / "data" / "profile_HMMs" / f"{args.m}.hmm")
    )
    m_pad = pp._round_up(max(p7.num_states, 8), 8)
    n_passes = max(1, int(np.ceil(np.log2(max(m_pad, 2)))))
    window = pp.pick_prob_chain_window(p7)
    print(f"# M={p7.num_states} window={window}/{n_passes}")

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 20, size=(args.batch, args.seq_len)).astype(np.int32)
    lengths = np.full(args.batch, args.seq_len, dtype=np.int32)
    cells = int(lengths.astype(np.int64).sum()) * (p7.model_length - 1)

    tokens_t, lengths_p, tr_rows, _, l_chunk = pp._prepare_tokens(
        tokens, lengths, pp.DEFAULT_L_CHUNK
    )
    tr_probs = pp.length_transition_probs(lengths_p)
    dev_tok = jnp.asarray(tokens_t)
    dev_len = jnp.asarray(lengths_p)
    dev_rows = jnp.asarray(tr_rows)
    dev_probs = jnp.asarray(tr_probs)

    orig_pick = pp.pick_prob_chain_window
    scores = {}
    for label, pick in (("trunc", orig_pick),
                        ("full", lambda p, m_pad=None: n_passes)):
        pp.pick_prob_chain_window = pick
        packed = pp.prepare_p7_device_prob(p7)
        dev = tuple(jnp.asarray(x) for x in packed)
        pp._fwd_prob_padded.clear_cache()
        best, reps = timeit(
            lambda: pp._fwd_prob_padded(
                *dev[:4], dev_tok, dev_len, dev_rows, dev_probs, dev[4],
                l_chunk=l_chunk, interpret=False,
            ),
            args.reps,
        )
        scores[label] = np.asarray(
            pp._fwd_prob_padded(
                *dev[:4], dev_tok, dev_len, dev_rows, dev_probs, dev[4],
                l_chunk=l_chunk, interpret=False,
            )
        )[: args.batch]
        print(
            f"forward {label:5s} ({packed[3].shape[1]:2d} passes): "
            f"{cells/best/1e9:7.2f} GCUPS {best*1e3:8.2f} ms "
            f"reps={[f'{x*1e3:.1f}' for x in reps]}",
            flush=True,
        )
    pp.pick_prob_chain_window = orig_pick
    gap = float(np.abs(scores["trunc"] - scores["full"]).max())
    print(f"score |trunc-full| max = {gap:.3e}  (bound: ~1e-9 rel)")

    # posterior decode A/B at a hit-sized batch
    ptok = rng.integers(0, 20, size=(args.post_batch, args.post_len)).astype(np.int32)
    plen = np.full(args.post_batch, args.post_len, dtype=np.int32)
    pcells = int(plen.astype(np.int64).sum()) * (p7.model_length - 1)
    for label, pick in (("trunc", orig_pick),
                        ("full", lambda p, m_pad=None: n_passes)):
        # prepare_suffix_chain binds the picker at import time — patch
        # both namespaces so forward and suffix windows stay in step
        pp.pick_prob_chain_window = pick
        post.pick_prob_chain_window = pick
        best, reps = timeit(
            lambda: post.posterior_coverage_batch_pallas(p7, ptok, plen)[0],
            args.reps,
        )
        print(
            f"posterior {label:5s}: {pcells/best/1e9:7.2f} GCUPS "
            f"{best*1e3:8.2f} ms reps={[f'{x*1e3:.1f}' for x in reps]}",
            flush=True,
        )
    pp.pick_prob_chain_window = orig_pick


if __name__ == "__main__":
    main()
