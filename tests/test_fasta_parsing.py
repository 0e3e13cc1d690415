"""FASTA parser tests.

The golden 4-record parse mirrors the reference's own FASTA test against
FASTA_files/fasta_like_example.fsa (data_readers/test_fasta_parsing.cpp),
including the '#'-sentinel view; negative-path tests cover the edges the
reference left undefined (SURVEY.md quirks 5/6).
"""

import numpy as np
import pytest

from hmm_fasta_viterbi_tpu import parse_fasta, parse_fasta_text
from hmm_fasta_viterbi_tpu.io.fastaio import FastaParseError, FastaRecord, write_fasta


def test_example_fasta_golden(fasta_dir):
    db = parse_fasta(fasta_dir / "fasta_like_example.fsa")
    assert db.sequences == [
        "#ACDEFGHIKLMNPQTVWY",
        "#ACDKLMNPQTVWYEFGHI",
        "#EFMNRGHIKLMNPQT",
        "#MKMRFFSSPCGKAAVDPADRCKEVQQIRDQHPSKIPVIIERYKGEKQLPVLDKTKFLVPDHVNMSE"
        "LVKIIRRRLQLNPTQAFFLLVNQHSMVSVSTPIADIYEQEKDEDGFLYMVYASQETFGFIRENE",
    ]
    # multi-line join for the real protein record
    assert len(db.records[3]) == 130
    assert db.records[3].header.startswith("gi|31563518|ref|NP_852610.1|")


def test_random_fasta(fasta_dir):
    db = parse_fasta(fasta_dir / "random_FASTA.fsa")
    assert len(db) == 3
    assert all(len(r) == 3500 for r in db.records)


def test_rejection_of_invalid_symbols():
    text = ">ok\nACDEF\n>bad\nACDXF\n>ok2\nGHIKL\n"
    db = parse_fasta_text(text)
    assert [r.sequence for r in db.records] == ["ACDEF", "GHIKL"]
    assert [r.sequence for r in db.rejected] == ["ACDXF"]


def test_empty_lines_and_whitespace_ok():
    text = ">a\nACD\n\nEF\n\n>b\nGHI\n"
    db = parse_fasta_text(text)
    assert [r.sequence for r in db.records] == ["ACDEF", "GHI"]


def test_data_before_header_raises():
    with pytest.raises(FastaParseError):
        parse_fasta_text("ACDEF\n>late\nGHI\n")


def test_empty_record():
    db = parse_fasta_text(">empty\n>full\nACD\n")
    assert [r.sequence for r in db.records] == ["", "ACD"]
    assert db.sequences[0] == "#"


def test_encode_batch():
    db = parse_fasta_text(">a\nACD\n>b\nACDEF\n")
    tokens, lengths = db.encode(pad_multiple=4)
    assert tokens.shape == (2, 8)
    assert lengths.tolist() == [3, 5]
    assert tokens[0, :3].tolist() == [0, 1, 2]
    assert tokens[1, :5].tolist() == [0, 1, 2, 3, 4]
    assert np.all(tokens[0, 3:] == 0)  # pad token


def test_write_roundtrip(tmp_path):
    recs = [FastaRecord("r0", "ACDEF" * 30), FastaRecord("r1", "GHIKL")]
    path = tmp_path / "out.fsa"
    write_fasta(path, recs)
    db = parse_fasta(path)
    assert [r.sequence for r in db.records] == [r.sequence for r in recs]
    assert [r.header for r in db.records] == ["r0", "r1"]
    # wrapped at 70 columns like the reference generator
    lines = path.read_text().splitlines()
    assert max(len(l) for l in lines) == 70
