"""Mosaic compile-failure fallbacks (round 4).

The lazy-Viterbi and bf16-stream posterior kernels landed after the TPU
tunnel's last up-window, so their first real Mosaic compile happens in
production. These tests simulate a hardware compile rejection — which
surfaces at materialization (np.asarray), not at dispatch — and assert
the engine falls back to the eager / lax.scan path with correct scores
instead of dying.
"""

from __future__ import annotations

import numpy as np
import pytest

import hmm_fasta_viterbi_tpu as hv
from hmm_fasta_viterbi_tpu.models.p7 import P7Profile
from hmm_fasta_viterbi_tpu.ops import pallas_p7, pallas_posterior
from hmm_fasta_viterbi_tpu.ops.p7_scan import (
    posterior_coverage_batch_xla,
    viterbi_xla,
)
from hmm_fasta_viterbi_tpu.pipeline import MSVScanner

from conftest import FASTA_DIR, PROFILE_DIR

FASTA_EXAMPLE = FASTA_DIR / "fasta_like_example.fsa"


class _RaisesOnMaterialize:
    """Mimics a jax.Array whose remote Mosaic compile was rejected:
    dispatch succeeds, materialization raises."""

    def __init__(self, shape):
        self.shape = shape

    def __array__(self, *a, **k):
        raise RuntimeError("Mosaic failed to compile TPU kernel (simulated)")

    def __getitem__(self, idx):
        return self


@pytest.fixture()
def small_case():
    hmm = hv.parse_hmm(PROFILE_DIR / "100.hmm")
    p7 = P7Profile.from_profile(hmm)
    db = hv.parse_fasta(FASTA_EXAMPLE)
    tokens, lengths = db.encode()
    return hmm, p7, tokens, lengths


def _patch_lazy_rejected(monkeypatch):
    """_p7_pallas_padded: lazy calls return a poisoned result; eager
    calls run the real kernel (interpret — these tests run on CPU)."""
    real = pallas_p7._p7_pallas_padded
    calls = {"lazy": 0, "eager": 0}

    def fake(*args, lazy_k=0, **kw):
        if lazy_k:
            calls["lazy"] += 1
            return _RaisesOnMaterialize((1,))
        calls["eager"] += 1
        kw["interpret"] = True
        return real(*args, lazy_k=0, **kw)

    monkeypatch.setattr(pallas_p7, "_p7_pallas_padded", fake)
    return calls


def test_viterbi_pallas_falls_back_to_eager(monkeypatch, small_case):
    _, p7, tokens, lengths = small_case
    calls = _patch_lazy_rejected(monkeypatch)
    monkeypatch.setattr(pallas_p7, "_LAZY_HW_VERDICT", {})

    got = np.asarray(
        pallas_p7.viterbi_pallas(p7, tokens, lengths, interpret=False)
    )
    want = np.asarray(viterbi_xla(p7, tokens, lengths))
    np.testing.assert_array_equal(got, want)
    assert calls == {"lazy": 1, "eager": 1}
    assert list(pallas_p7._LAZY_HW_VERDICT.values()) == [False]

    # second call: verdict cached, goes straight to eager
    got2 = np.asarray(
        pallas_p7.viterbi_pallas(p7, tokens, lengths, interpret=False)
    )
    np.testing.assert_array_equal(got2, want)
    assert calls["lazy"] == 1


def test_viterbi_pallas_no_fallback_raises(monkeypatch, small_case):
    _, p7, tokens, lengths = small_case
    _patch_lazy_rejected(monkeypatch)
    monkeypatch.setattr(pallas_p7, "_LAZY_HW_VERDICT", {})
    # validation callers must see the failure, not an eager comparison
    out = pallas_p7.viterbi_pallas(
        p7, tokens, lengths, interpret=False, hw_fallback=False
    )
    with pytest.raises(RuntimeError, match="simulated"):
        np.asarray(out)


def test_scan_p7_falls_back_to_eager(monkeypatch, small_case):
    _, p7, tokens, lengths = small_case
    calls = _patch_lazy_rejected(monkeypatch)

    sc = MSVScanner(backend="pallas")  # CPU -> interpret
    # force the non-interpret probe path the TPU backend takes;
    # scan_p7's _vit passes interpret=self.interpret and our fake
    # forces interpret=True for eager calls, so the fallback runs real
    sc.interpret = False
    staged = MSVScanner(backend="pallas").stage(tokens, lengths)
    got = np.asarray(sc.scan_p7(p7, staged, stage="viterbi"))
    want = np.asarray(viterbi_xla(p7, tokens, lengths))
    np.testing.assert_array_equal(got, want)
    assert calls == {"lazy": 1, "eager": 1}
    assert list(sc._lazy_hw.values()) == [False]

    # second scan: cached verdict routes straight to the eager pack
    got2 = np.asarray(sc.scan_p7(p7, staged, stage="viterbi"))
    np.testing.assert_array_equal(got2, want)
    assert calls["lazy"] == 1


def test_posterior_falls_back_to_xla(monkeypatch, small_case):
    _, p7, tokens, lengths = small_case

    def fake_padded(*args, **kw):
        return _RaisesOnMaterialize((1,)), _RaisesOnMaterialize((1,))

    monkeypatch.setattr(pallas_posterior, "_posterior_padded", fake_padded)
    monkeypatch.setattr(pallas_posterior, "_POST_HW_VERDICT", {})

    cov, tot = pallas_posterior.posterior_coverage_batch_pallas(
        p7, tokens, lengths, interpret=False
    )
    wcov, wtot = posterior_coverage_batch_xla(p7, tokens, lengths)
    np.testing.assert_allclose(tot, wtot, atol=1e-5)
    np.testing.assert_allclose(
        cov[:, : wcov.shape[1]], wcov, atol=1e-5
    )
    assert list(pallas_posterior._POST_HW_VERDICT.values()) == [False]

    # verdict cached: next call skips the pallas attempt entirely
    calls = {"n": 0}

    def count_padded(*args, **kw):
        calls["n"] += 1
        raise AssertionError("must not be reached")

    monkeypatch.setattr(pallas_posterior, "_posterior_padded", count_padded)
    cov2, tot2 = pallas_posterior.posterior_coverage_batch_pallas(
        p7, tokens, lengths, interpret=False
    )
    np.testing.assert_allclose(tot2, wtot, atol=1e-5)
    assert calls["n"] == 0


def test_posterior_no_fallback_raises(monkeypatch, small_case):
    _, p7, tokens, lengths = small_case

    def fake_padded(*args, **kw):
        return _RaisesOnMaterialize((1,)), _RaisesOnMaterialize((1,))

    monkeypatch.setattr(pallas_posterior, "_posterior_padded", fake_padded)
    monkeypatch.setattr(pallas_posterior, "_POST_HW_VERDICT", {})
    with pytest.raises(RuntimeError, match="simulated"):
        pallas_posterior.posterior_coverage_batch_pallas(
            p7, tokens, lengths, interpret=False, hw_fallback=False
        )
