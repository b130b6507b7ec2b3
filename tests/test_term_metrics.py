"""Tests for tools/term_metrics.py (term_metrics.cpp:1-546 equivalent)."""
import io
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import term_metrics  # noqa: E402

REPO = Path(__file__).resolve().parents[1]


def test_tokenize_splits_snake_case():
    assert term_metrics.tokenize("track_max_speed") == ["track", "max", "speed"]
    assert term_metrics.tokenize("The maximum-speed, 3cm/s!") == [
        "the", "maximum", "speed", "3cm", "s"]


def test_preprocess_doc_frequency_counts_entries_not_occurrences():
    names = ["a_one", "b_one", "c_two"]
    docs = ["one one one", "", "two"]
    data = term_metrics.preprocess_corpus(names, docs)
    # "one" appears in 2 entries (a and b), despite 4 token occurrences
    assert data.doc_frequency["one"] == 2
    assert data.doc_frequency["two"] == 1
    # rarer term has the higher importance (idf)
    assert data.term_importance["two"] > data.term_importance["one"]


def test_text_search_ranks_name_hits_above_doc_hits():
    names = ["track_max_speed", "other_param", "unrelated"]
    docs = ["how fast", "the maximum speed an individual can have", "nothing"]
    data = term_metrics.preprocess_corpus(names, docs)
    ranked = term_metrics.text_search("max speed", names, data, docs)
    assert ranked[0] == 0          # name tokens beat doc-only matches
    assert 1 in ranked             # doc match still returned
    assert 2 not in ranked         # no-hit entries excluded


def test_text_search_prefix_matching():
    names = ["track_threshold", "frame_rate"]
    docs = ["", ""]
    data = term_metrics.preprocess_corpus(names, docs)
    assert term_metrics.text_search("thresh", names, data, docs) == [0]


def test_cli_end_to_end(tmp_path, capsys):
    corpus = tmp_path / "corpus.txt"
    corpus.write_text(
        "track_max_speed The maximum speed an individual can have\n"
        "track_threshold Constant threshold value\n"
        "frame_rate Frames per second\n")
    rc = term_metrics.main([str(corpus), "-t", "3", "-s", "speed",
                            "--choose-method", "compare"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Corpus entries: 3" in out
    assert "Top terms by importance" in out
    assert "Comparative search results for speed" in out
    assert "[track_max_speed]" in out


def test_dump_params_corpus_covers_registry():
    buf = io.StringIO()
    term_metrics.dump_params_corpus(buf)
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) > 300  # the full parameter registry
    names = [ln.split(None, 1)[0] for ln in lines]
    assert "track_max_speed" in names
    assert "track_threshold" in names


def test_cli_subprocess_smoke(tmp_path):
    corpus = tmp_path / "c.txt"
    corpus.write_text("alpha_beta doc words here\n")
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "term_metrics.py"),
         str(corpus), "--no-top-terms", "-s", "alpha", "--no-docs"],
        capture_output=True, text=True, timeout=120)
    assert res.returncode == 0, res.stderr
    assert "[alpha_beta]" in res.stdout
