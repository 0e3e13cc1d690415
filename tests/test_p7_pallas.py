"""Differential tests for the Pallas Viterbi/Forward kernels
(interpret mode on the CPU mesh; the same kernels compile on TPU).

Oracle chain: brute-force path enumeration -> sequential NumPy oracle
(test_p7.py) -> these kernels.
"""

import numpy as np
import pytest

from hmm_fasta_viterbi_tpu import parse_hmm, parse_hmm_text
from hmm_fasta_viterbi_tpu.models.p7 import P7Profile
from hmm_fasta_viterbi_tpu.ops.pallas_p7 import forward_pallas, viterbi_pallas
from hmm_fasta_viterbi_tpu.ops.reference import (
    forward_oracle_batch,
    viterbi_oracle_batch,
)

from test_hmm_parsing import MINI_HMM

VIT_TOL = 1e-4
FWD_TOL = 2e-3


@pytest.fixture(scope="module")
def p7_100(profile_dir):
    return P7Profile.from_profile(parse_hmm(profile_dir / "100.hmm"))


@pytest.fixture(scope="module")
def p7_200(profile_dir):
    return P7Profile.from_profile(parse_hmm(profile_dir / "200.hmm"))


def _ragged(seed=1, n=6, width=128):
    rng = np.random.default_rng(seed)
    lengths = np.minimum(
        np.array([64, 1, 33, width, 17, 2][:n], dtype=np.int32), width
    )
    tokens = rng.integers(0, 20, size=(n, width)).astype(np.int32)
    return tokens, lengths


def test_viterbi_pallas_vs_oracle(p7_100):
    tokens, lengths = _ragged()
    want = viterbi_oracle_batch(p7_100, tokens, lengths)
    got = np.asarray(viterbi_pallas(p7_100, tokens, lengths, interpret=True))
    np.testing.assert_allclose(got, want, atol=VIT_TOL, rtol=0)


def test_forward_pallas_vs_oracle(p7_100):
    tokens, lengths = _ragged(seed=2)
    want = forward_oracle_batch(p7_100, tokens, lengths)
    got = np.asarray(forward_pallas(p7_100, tokens, lengths, interpret=True))
    np.testing.assert_allclose(got, want, atol=FWD_TOL, rtol=0)


def test_viterbi_pallas_second_profile(p7_200):
    """Different M bucket exercises a different chain-pass count."""
    tokens, lengths = _ragged(seed=3)
    want = viterbi_oracle_batch(p7_200, tokens, lengths)
    got = np.asarray(viterbi_pallas(p7_200, tokens, lengths, interpret=True))
    np.testing.assert_allclose(got, want, atol=VIT_TOL, rtol=0)


def test_viterbi_pallas_mini_profile():
    """Tiny hand-written profile: heavy D-path usage, m_pad == 8 floor."""
    p7 = P7Profile.from_profile(parse_hmm_text(MINI_HMM))
    tokens, lengths = _ragged(seed=4, n=4, width=32)
    want = viterbi_oracle_batch(p7, tokens, lengths)
    got = np.asarray(viterbi_pallas(p7, tokens, lengths, interpret=True))
    np.testing.assert_allclose(got, want, atol=VIT_TOL, rtol=0)


def test_pallas_padding_invariance(p7_100):
    """Extending the padded width must not change scores."""
    rng = np.random.default_rng(5)
    tokens = rng.integers(0, 20, size=(2, 50)).astype(np.int32)
    lengths = np.array([50, 31], dtype=np.int32)
    a = np.asarray(viterbi_pallas(p7_100, tokens, lengths, interpret=True))
    wider = np.concatenate(
        [tokens, rng.integers(0, 20, size=(2, 46)).astype(np.int32)], axis=1
    )
    b = np.asarray(viterbi_pallas(p7_100, wider, lengths, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_forward_prob_space_vs_oracle(p7_100):
    """Scaled-probability Forward kernel (the default TPU path)."""
    tokens, lengths = _ragged(seed=6)
    want = forward_oracle_batch(p7_100, tokens, lengths)
    got = np.asarray(
        forward_pallas(p7_100, tokens, lengths, interpret=True, prob_space=True)
    )
    np.testing.assert_allclose(got, want, atol=FWD_TOL, rtol=0)


def test_forward_prob_space_long_sequence(p7_100):
    """Many rescale groups + chunk-boundary carries (log_scale row)."""
    rng = np.random.default_rng(7)
    lengths = np.array([700, 512], dtype=np.int32)
    tokens = rng.integers(0, 20, size=(2, 700)).astype(np.int32)
    want = forward_oracle_batch(p7_100, tokens, lengths)
    got = np.asarray(
        forward_pallas(p7_100, tokens, lengths, interpret=True, prob_space=True)
    )
    np.testing.assert_allclose(got, want, atol=FWD_TOL, rtol=0)


def test_forward_prob_space_mini_profile():
    """Tiny profile (mr=2, m_pad=8): wrap-around rows and pad rows are
    exercised hard; kill_last zeros must keep the chain identity."""
    p7 = P7Profile.from_profile(parse_hmm_text(MINI_HMM))
    tokens, lengths = _ragged(seed=8, n=4, width=32)
    want = forward_oracle_batch(p7, tokens, lengths)
    got = np.asarray(
        forward_pallas(p7, tokens, lengths, interpret=True, prob_space=True)
    )
    np.testing.assert_allclose(got, want, atol=FWD_TOL, rtol=0)


def test_wide_lane_tiles_vs_oracle(p7_100):
    """Batch 260 -> b_pad 384 -> 128-lane tiles; batch 256 -> 256-lane
    tiles: the wide-tile block specs must score identically (the TPU
    bench always runs wide tiles; CI must cover them too)."""
    rng = np.random.default_rng(31)
    base_tokens = rng.integers(0, 20, size=(256, 64)).astype(np.int32)
    base_lengths = np.full(256, 64, dtype=np.int32)
    base_lengths[3] = 17
    base_lengths[100] = 1
    want = viterbi_oracle_batch(p7_100, base_tokens[:4], base_lengths[:4])
    got = np.asarray(
        viterbi_pallas(p7_100, base_tokens, base_lengths, interpret=True)
    )[:4]
    np.testing.assert_allclose(got, want, atol=VIT_TOL, rtol=0)
    got_f = np.asarray(
        forward_pallas(p7_100, base_tokens, base_lengths, interpret=True)
    )[:4]
    want_f = forward_oracle_batch(p7_100, base_tokens[:4], base_lengths[:4])
    np.testing.assert_allclose(got_f, want_f, atol=FWD_TOL, rtol=0)


def test_forward_pallas_ragged_long_tail_regression():
    """ADVICE r1 (high): short lanes of a ragged batch kept caller junk
    tokens between lengths[b] and the batch max (encode() pads with
    0='A'); the prob-space kernel's frozen C carry was then rescaled
    against the junk lane's growing odds until it underflowed to 0 ->
    log(C) = -inf (silent false negative). Insert emissions biased
    toward 'A' force per-step odds growth > 1 so a 512-token junk tail
    reliably underflows without the staging-time PAD fill."""
    biased = MINI_HMM.replace("          3.0  ", "          0.05  ")
    p7 = P7Profile.from_profile(parse_hmm_text(biased))
    width = 512
    rng = np.random.default_rng(7)
    tokens = np.zeros((2, width), dtype=np.int32)  # junk tail = 0 = 'A'
    tokens[0] = rng.integers(0, 20, size=width)
    lengths = np.array([width, 6], dtype=np.int32)
    want = forward_oracle_batch(p7, tokens, lengths)
    got = np.asarray(forward_pallas(p7, tokens, lengths, interpret=True))
    assert np.isfinite(got).all(), got
    np.testing.assert_allclose(got, want, atol=FWD_TOL, rtol=0)


# ---- upper-bound Viterbi filter (VERDICT r1 #1) -----------------------

def test_viterbi_filter_upper_bound(p7_100):
    """Filter scores must dominate the exact scores for every lane
    (zero-false-negative contract). p7_100 pads to m_pad=104, so the
    default window (2^3) truncates the chain and the tail-compensation
    term is live."""
    from hmm_fasta_viterbi_tpu.ops.pallas_p7 import viterbi_filter_pallas

    tokens, lengths = _ragged(seed=11)
    exact = np.asarray(viterbi_pallas(p7_100, tokens, lengths, interpret=True))
    filt = np.asarray(
        viterbi_filter_pallas(p7_100, tokens, lengths, interpret=True)
    )
    assert np.all(filt >= exact - 1e-6), (filt - exact).min()
    # the bound must stay useful: bf16 round-up adds ~0.4% relative per
    # emission and the chain compensation a few nats at most
    assert np.all(filt <= exact + 10.0), (filt - exact).max()


@pytest.mark.parametrize("window", [1, 2, 3, 10])
def test_viterbi_filter_chain_window_sweep(p7_100, window):
    """The truncated chain keeps the upper bound for every window;
    window=10 exceeds full_passes (=7 at m_pad 104) and exercises the
    untruncated chain path."""
    from hmm_fasta_viterbi_tpu.ops.pallas_p7 import viterbi_filter_pallas

    tokens, lengths = _ragged(seed=window)
    exact = np.asarray(viterbi_pallas(p7_100, tokens, lengths, interpret=True))
    filt = np.asarray(
        viterbi_filter_pallas(
            p7_100, tokens, lengths, interpret=True, window_log2=window
        )
    )
    assert np.all(filt >= exact - 1e-6), (window, (filt - exact).min())


def test_viterbi_filter_star_tdd_quirk():
    """A '*' d->d field parses as prob 1.0 -> tdd log 0 (SURVEY quirk 1);
    the geometric tail bound degenerates to max(a0)+0 — still sound."""
    from hmm_fasta_viterbi_tpu.ops.pallas_p7 import viterbi_filter_pallas

    p7 = P7Profile.from_profile(parse_hmm_text(MINI_HMM))
    tokens, lengths = _ragged(seed=4, width=64)
    exact = np.asarray(viterbi_pallas(p7, tokens, lengths, interpret=True))
    filt = np.asarray(viterbi_filter_pallas(p7, tokens, lengths, interpret=True))
    assert np.all(filt >= exact - 1e-6)


# ---- long-L Forward accumulation gate (VERDICT r1 #7) -----------------

def test_forward_long_l_accumulation_drift():
    """16k-step prob-space Forward must stay within tolerance of the
    oracle. This pins the Kahan-compensated log-scale accumulator
    (ops/pallas_p7.py _fwd_prob_kernel): without it, thousands of small
    f32 increments onto a growing log-scale drift by ~ulp(total) *
    n_groups (measured 4e-2 nats at L=36864 on hardware, ~1e-2 at this
    length on CPU too — an order of magnitude over this gate)."""
    from hmm_fasta_viterbi_tpu.ops.reference import forward_oracle_batch

    p7 = P7Profile.from_profile(parse_hmm_text(MINI_HMM))
    rng = np.random.default_rng(5)
    L = 16384
    tokens = rng.integers(0, 20, size=(1, L)).astype(np.int32)
    lengths = np.array([L], dtype=np.int32)
    want = forward_oracle_batch(p7, tokens, lengths)
    got = np.asarray(forward_pallas(p7, tokens, lengths, interpret=True))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=0)


def test_length_transition_probs_host_exact():
    """p_loop/p_move must be the correctly-rounded f32 of the exact
    real value (f64 division, no log/exp round trip): an in-kernel or
    log/exp-roundtripped probability carries ~1e-6 relative bias that
    COMPOUNDS once per residue (the 4e-2-nat drift class; CPU tests
    cannot catch the TPU-transcendental variant, so the mechanism —
    host-exact values — is pinned here)."""
    from hmm_fasta_viterbi_tpu.ops.pallas_p7 import length_transition_probs

    lengths = np.array([0, 1, 7, 3500, 36864, 2**20], dtype=np.int64)
    got = length_transition_probs(lengths)
    import decimal

    for k, L in enumerate(lengths):
        exact_loop = np.float32(
            decimal.Decimal(int(L)) / decimal.Decimal(int(L) + 3)
        )
        exact_move = np.float32(
            decimal.Decimal(3) / decimal.Decimal(int(L) + 3)
        )
        assert got[0, k] == exact_loop, (L, got[0, k], exact_loop)
        assert got[1, k] == exact_move


def test_lazy_viterbi_bitwise_equals_full(p7_100):
    """Round 3: the lazily-certified truncated-chain kernel must be
    BITWISE identical to the eager full-chain kernel (and the oracle),
    including a window small enough to force the in-kernel fallback.
    (Round 5 trimmed this interpret-mode suite to one profile and two
    windows: the real gate — lazy-vs-eager bitwise at every profile's
    auto-K — runs ON CHIP in tools/validate_hw.py across all 24
    profiles, docs/campaign_r05/validate_r5.log.)"""
    rng = np.random.default_rng(17)
    for p7 in (p7_100,):
        tokens = rng.integers(0, 20, size=(4, 150)).astype(np.int32)
        lengths = np.array([150, 93, 1, 150], dtype=np.int32)
        full = np.asarray(
            viterbi_pallas(p7, tokens, lengths, interpret=True, lazy=False)
        )
        want = viterbi_oracle_batch(p7, tokens, lengths)
        for k in (1, None):  # 1 forces the fallback; None auto-picks
            lazy = np.asarray(
                viterbi_pallas(
                    p7, tokens, lengths, interpret=True, lazy_k=k
                )
            )
            np.testing.assert_array_equal(lazy, full)
        np.testing.assert_allclose(full, want, atol=1e-4, rtol=0)

        # multi-chunk: l_chunk=64 -> 3 grid chunks; exercises the
        # chunk-level replay merging through the out-ref carry at each
        # chunk boundary (v3 repairs a WHOLE chunk at a time)
        full_mc = np.asarray(
            viterbi_pallas(
                p7, tokens, lengths, l_chunk=64, interpret=True, lazy=False
            )
        )
        np.testing.assert_array_equal(full_mc, full)
        for k in (1, None):
            lazy_mc = np.asarray(
                viterbi_pallas(
                    p7, tokens, lengths, l_chunk=64, interpret=True, lazy_k=k
                )
            )
            np.testing.assert_array_equal(lazy_mc, full)


def test_lazy_viterbi_group_cert_bitwise(p7_100):
    """Round 4: the group-amortized certificate (one bound per unroll
    group from running e_max / pd_min) must stay bitwise-exact — both
    when the truncation is safe (auto K) and when a tiny window forces
    the fallback replay through the group path."""
    rng = np.random.default_rng(29)
    tokens = rng.integers(0, 20, size=(4, 150)).astype(np.int32)
    lengths = np.array([150, 93, 1, 150], dtype=np.int32)
    full = np.asarray(
        viterbi_pallas(p7_100, tokens, lengths, interpret=True, lazy=False)
    )
    from hmm_fasta_viterbi_tpu.ops.pallas_p7 import DEFAULT_L_CHUNK

    for l_chunk in (DEFAULT_L_CHUNK, 64):
        for k in (1, None):
            got = np.asarray(
                viterbi_pallas(
                    p7_100, tokens, lengths, l_chunk=l_chunk,
                    interpret=True, lazy_k=k, group_cert=True,
                )
            )
            np.testing.assert_array_equal(got, full)


def test_lazy_viterbi_weak_damping_profile():
    """A profile with near-free deletions (tdd ~ log 0.98) makes long
    delete runs genuinely competitive — the certificate must fire and
    the fallback must keep scores exact."""
    from test_hmm_parsing import MINI_HMM

    hmm = parse_hmm_text(MINI_HMM)
    p7 = P7Profile.from_profile(hmm)
    # rebuild with weak deletion damping: tdd = log(0.98)
    p7 = type(p7)(
        **{
            **{f.name: getattr(p7, f.name) for f in p7.__dataclass_fields__.values()},
            "tdd": np.where(
                np.isfinite(p7.tdd), np.float32(np.log(0.98)), p7.tdd
            ).astype(np.float32),
        }
    )
    rng = np.random.default_rng(23)
    tokens = rng.integers(0, 20, size=(3, 40)).astype(np.int32)
    lengths = np.array([40, 17, 40], dtype=np.int32)
    full = np.asarray(
        viterbi_pallas(p7, tokens, lengths, interpret=True, lazy=False)
    )
    lazy = np.asarray(
        viterbi_pallas(p7, tokens, lengths, interpret=True, lazy_k=1)
    )
    np.testing.assert_array_equal(lazy, full)
    want = viterbi_oracle_batch(p7, tokens, lengths)
    np.testing.assert_allclose(lazy, want, atol=1e-4, rtol=0)


def test_prob_chain_truncation_invisible(profile_dir, monkeypatch):
    """Round 3: the prob-space delete chain runs only
    pick_prob_chain_window passes (the window is the chain array's
    column count). The truncation bound says dropped-run mass is
    < 1e-9 relative even over 1e6 residues — so scores must match the
    full-chain kernel to within trace-order noise, far inside FWD_TOL."""
    from hmm_fasta_viterbi_tpu.ops import pallas_p7 as pp

    p7 = P7Profile.from_profile(parse_hmm(profile_dir / "300.hmm"))
    m_pad = pp._round_up(p7.num_states, 8)
    n_passes = int(np.ceil(np.log2(m_pad)))
    window = pp.pick_prob_chain_window(p7)
    assert 1 <= window < n_passes  # this data profile actually truncates

    tokens, lengths = _ragged(seed=11)
    trunc = np.asarray(
        forward_pallas(p7, tokens, lengths, interpret=True, prob_space=True)
    )
    with monkeypatch.context() as m:
        m.setattr(pp, "pick_prob_chain_window", lambda p7, m_pad=None: n_passes)
        full = np.asarray(
            forward_pallas(p7, tokens, lengths, interpret=True, prob_space=True)
        )
    np.testing.assert_allclose(trunc, full, atol=1e-5, rtol=0)


def test_prob_chain_window_per_profile(profile_dir):
    """The picked window saves passes on the damped data profiles and
    falls back to the full chain where damping is too weak (200.hmm)."""
    from hmm_fasta_viterbi_tpu.ops import pallas_p7 as pp

    for name in ("100", "500", "1400", "2405"):
        p7 = P7Profile.from_profile(parse_hmm(profile_dir / f"{name}.hmm"))
        m_pad = pp._round_up(max(p7.num_states, 8), 8)
        n_passes = max(1, int(np.ceil(np.log2(m_pad))))
        w = pp.pick_prob_chain_window(p7)
        assert 1 <= w < n_passes, (name, w, n_passes)

    weak = P7Profile.from_profile(parse_hmm(profile_dir / "200.hmm"))
    assert pp.pick_prob_chain_window(weak) == 8  # == n_passes: no cut
