"""Differential tests: Pallas kernel (interpret mode on CPU) vs oracle
and vs the XLA gather scan — the reference's seq/par/par_spec invariant
(algorithms/test_MSV.cpp) mapped onto the TPU build's three paths.

Real-TPU (compiled) parity is exercised by the verify flow and bench;
these tests pin the kernel's semantics on the CPU interpreter.
"""

import numpy as np
import pytest

from hmm_fasta_viterbi_tpu import MSVProfile, msv_oracle_batch, parse_fasta, parse_hmm
from hmm_fasta_viterbi_tpu.ops.pallas_msv import msv_pallas
from hmm_fasta_viterbi_tpu.ops.xla_scan import msv_xla

TOL = 1e-4


@pytest.fixture(scope="module")
def profile(profile_dir):
    return MSVProfile.from_profile(parse_hmm(profile_dir / "100.hmm"))


def test_example_fasta_parity(profile_dir, fasta_dir):
    db = parse_fasta(fasta_dir / "fasta_like_example.fsa")
    tokens, lengths = db.encode(pad_multiple=8)
    for stem in ("100", "200", "1400"):
        prof = MSVProfile.from_profile(parse_hmm(profile_dir / f"{stem}.hmm"))
        want = msv_oracle_batch(prof, tokens, lengths)
        got = np.asarray(msv_pallas(prof, tokens, lengths, interpret=True))
        np.testing.assert_allclose(got, want, atol=TOL, rtol=0)


def test_pallas_vs_xla_random(profile):
    rng = np.random.default_rng(5)
    lengths = np.array([64, 100, 1, 77, 128, 0, 55, 9], dtype=np.int32)
    tokens = rng.integers(0, 20, size=(len(lengths), 128)).astype(np.int32)
    want = np.asarray(msv_xla(profile, tokens, lengths))
    got = np.asarray(msv_pallas(profile, tokens, lengths, interpret=True))
    mask = lengths > 0
    np.testing.assert_allclose(got[mask], want[mask], atol=TOL, rtol=0)
    assert np.isneginf(got[~mask]).all()


def test_chunk_boundaries(profile):
    """Carry must thread exactly across L-chunk boundaries."""
    rng = np.random.default_rng(6)
    tokens = rng.integers(0, 20, size=(2, 48)).astype(np.int32)
    lengths = np.array([48, 33], dtype=np.int32)
    want = msv_oracle_batch(profile, tokens, lengths)
    for l_chunk in (8, 16, 48):
        got = np.asarray(
            msv_pallas(profile, tokens, lengths, l_chunk=l_chunk, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=TOL, rtol=0)


def test_batch_tiling(profile):
    """Batches beyond one 128-lane tile."""
    rng = np.random.default_rng(8)
    b = 130  # forces 2 batch tiles
    tokens = rng.integers(0, 20, size=(b, 40)).astype(np.int32)
    lengths = rng.integers(1, 41, size=b).astype(np.int32)
    want = msv_oracle_batch(profile, tokens, lengths)
    got = np.asarray(msv_pallas(profile, tokens, lengths, interpret=True))
    np.testing.assert_allclose(got, want, atol=TOL, rtol=0)


def test_non_multiple_of_8_model(profile_dir):
    """M=1001 -> Mr=1001 pads to 1008 sublanes; padded rows must not leak."""
    prof = MSVProfile.from_profile(parse_hmm(profile_dir / "1001.hmm"))
    assert prof.num_states % 8 != 0
    rng = np.random.default_rng(9)
    tokens = rng.integers(0, 20, size=(3, 64)).astype(np.int32)
    lengths = np.array([64, 10, 64], dtype=np.int32)
    want = msv_oracle_batch(prof, tokens, lengths)
    got = np.asarray(msv_pallas(prof, tokens, lengths, interpret=True))
    np.testing.assert_allclose(got, want, atol=TOL, rtol=0)


def test_stacked_profiles(profile_dir, fasta_dir):
    """One kernel call scanning a stack of profiles (shared M_pad)."""
    from hmm_fasta_viterbi_tpu.ops.pallas_msv import msv_pallas_stacked

    db = parse_fasta(fasta_dir / "fasta_like_example.fsa")
    tokens, lengths = db.encode(pad_multiple=8)
    profiles = [
        MSVProfile.from_profile(parse_hmm(profile_dir / f"{s}.hmm"))
        for s in ("100", "200", "300")
    ]
    got = np.asarray(msv_pallas_stacked(profiles, tokens, lengths, interpret=True))
    assert got.shape == (3, tokens.shape[0])
    for k, p in enumerate(profiles):
        want = msv_oracle_batch(p, tokens, lengths)
        np.testing.assert_allclose(got[k], want, atol=TOL, rtol=0)


def test_scan_many_bucketed(profile_dir, fasta_dir):
    """Pipeline sweep path: bucketed stacked scans match per-profile."""
    from hmm_fasta_viterbi_tpu.pipeline import MSVScanner

    db = parse_fasta(fasta_dir / "fasta_like_example.fsa")
    tokens, lengths = db.encode()
    sc = MSVScanner(backend="pallas", interpret=True, l_chunk=64, m_bucket=256)
    staged = sc.stage(tokens, lengths)
    profiles = [
        MSVProfile.from_profile(parse_hmm(profile_dir / f"{s}.hmm"))
        for s in ("100", "200", "400", "500")  # 2 buckets at m_bucket=256
    ]
    results = sc.scan_many(profiles, staged)
    for p in profiles:
        want = msv_oracle_batch(p, tokens, lengths)
        np.testing.assert_allclose(results[p.name], want, atol=TOL, rtol=0)


def test_emit_k60_fold_bitwise_equals_3pass(profile):
    """The K=60 emission fold (round 5: [hi|mid|lo] stacked along the
    contraction axis, one MXU pass) must be BITWISE identical to the
    3-pass split — the fold's whole claim is exactness (the three
    disjoint-mantissa terms sum exactly in f32 in any order). On-chip
    A/B: docs/campaign_r05/ab_msv_k60.log (197.7 -> 403.0 GCUPS)."""
    from hmm_fasta_viterbi_tpu.ops.pallas_msv import (
        _msv_pallas_padded, _prepare_batch, prepare_scores_t,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    tokens = rng.integers(0, 20, size=(4, 200)).astype(np.int32)
    lengths = np.array([200, 3, 117, 200], dtype=np.int32)
    tokens_t, lengths_p, tr_rows, b, l_chunk = _prepare_batch(
        tokens, lengths, 256
    )
    scores_t = prepare_scores_t(profile)[None]
    tr_consts = np.array(
        [[profile.tr_B_Mk, profile.tr_E_C, profile.tr_E_J]],
        dtype=np.float32,
    )
    args = [jnp.asarray(scores_t), jnp.asarray(tokens_t),
            jnp.asarray(lengths_p), jnp.asarray(tr_rows),
            jnp.asarray(tr_consts)]
    three = np.asarray(_msv_pallas_padded(
        *args, l_chunk=l_chunk, interpret=True, emit_k60=False))
    one = np.asarray(_msv_pallas_padded(
        *args, l_chunk=l_chunk, interpret=True, emit_k60=True))
    np.testing.assert_array_equal(one, three)
