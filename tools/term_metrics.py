#!/usr/bin/env python3
"""Terminal TF-IDF term metrics + parameter-docs text search.

Equivalent of the reference's ``term_metrics`` developer tool
(``Application/src/tools/term_metrics.cpp:1-546``): loads a corpus of
``<name> <docs...>`` lines (one settings parameter per line), prints a
term-frequency / document-frequency / idf table, and optionally runs the
text-search ranking used by the settings search UI
(``ui/StartingScene.cpp:123``) in three methods — ``with-docs``,
``names-only`` and a side-by-side ``compare``.

The reference delegates tokenization/ranking to the absent commons
``misc/stringutils.h`` (``preprocess_corpus`` / ``text_search``); this
port implements an equivalent ranking: lowercase alphanumeric tokens
(snake_case names split into subtokens), idf importance
``log(N / df)``, and query scoring by exact/prefix/substring token
matches weighted by idf with name hits weighted above doc hits.

Usage (mirrors the reference CLI):
    python tools/term_metrics.py --input corpus.txt [-s QUERY]
        [-t TOP] [-m MIN_FREQ] [-b importance|freq|docfreq]
        [--choose-method compare|with-docs|names-only] [--no-docs]
        [--no-top-terms]

A corpus for the in-repo parameter registry can be produced with
``python tools/term_metrics.py --dump-params`` (one line per parameter,
name followed by its doc string) — the same corpus shape the reference
feeds from its CONFIG registry.
"""
from __future__ import annotations

import argparse
import math
import re
import sys
from dataclasses import dataclass, field

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> list[str]:
    """Lowercase alphanumeric tokens; underscores/punctuation split."""
    return _TOKEN_RE.findall(text.lower())


@dataclass
class Preprocessed:
    """Mirror of commons' PreprocessedData(WithDocs): tokenized corpus +
    per-term document frequency and idf importance."""

    tokenized_names: list[list[str]] = field(default_factory=list)
    tokenized_docs: list[list[str]] = field(default_factory=list)
    doc_frequency: dict[str, int] = field(default_factory=dict)
    term_importance: dict[str, float] = field(default_factory=dict)


def preprocess_corpus(names: list[str], docs: list[str] | None = None) -> Preprocessed:
    data = Preprocessed()
    data.tokenized_names = [tokenize(n) for n in names]
    data.tokenized_docs = ([tokenize(d) for d in docs] if docs is not None
                           else [[] for _ in names])
    for nt, dt in zip(data.tokenized_names, data.tokenized_docs):
        for term in set(nt) | set(dt):
            data.doc_frequency[term] = data.doc_frequency.get(term, 0) + 1
    n = max(1, len(names))
    for term, df in data.doc_frequency.items():
        data.term_importance[term] = math.log(n / df) if df else 0.0
    return data


def _entry_score(query_tokens: list[str], name_tokens: list[str],
                 doc_tokens: list[str], data: Preprocessed,
                 raw_name: str) -> float:
    """Score one corpus entry for a query. Name hits outweigh doc hits;
    exact token > prefix > substring; each weighted by idf."""
    score = 0.0
    name_set = set(name_tokens)
    doc_set = set(doc_tokens)
    lname = raw_name.lower()
    for qt in query_tokens:
        idf = data.term_importance.get(qt, math.log(max(1, len(data.tokenized_names))))
        hit = 0.0
        if qt in name_set:
            hit = 3.0
        elif any(t.startswith(qt) for t in name_tokens):
            hit = 2.0
        elif qt in lname:
            hit = 1.5
        if qt in doc_set:
            hit = max(hit, 1.0)
        elif hit == 0.0 and any(t.startswith(qt) for t in doc_tokens):
            hit = 0.5
        score += hit * (1.0 + idf)
    # small bonus when the full query appears verbatim in the name
    if " ".join(query_tokens) and " ".join(query_tokens) in lname:
        score *= 1.25
    return score


def text_search(query: str, names: list[str], data: Preprocessed,
                docs: list[str] | None = None) -> list[int]:
    """Ranked corpus indexes for ``query`` (descending score, score>0),
    the role of commons ``text_search`` (stringutils)."""
    qtok = tokenize(query)
    if not qtok:
        return []
    scored = []
    for i, name in enumerate(names):
        s = _entry_score(qtok, data.tokenized_names[i],
                         data.tokenized_docs[i] if docs is not None else [],
                         data, name)
        if s > 0.0:
            scored.append((s, names[i], i))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [i for _, _, i in scored]


# ---------------------------------------------------------------- CLI


def shorten_text(text: str, width: int) -> str:
    if len(text) <= width:
        return text
    return text[: max(0, width - 3)] + "..."


def truncate_term(term: str, width: int) -> str:
    if len(term) <= width:
        return term
    if width <= 1:
        return term[:width]
    return term[: width - 1] + "~"


def make_bar(value: float, max_value: float, width: int) -> str:
    if max_value <= 0.0 or width == 0 or value <= 0.0:
        return ""
    count = int(value / max_value * width)
    return "#" * max(1, count)


def load_corpus(path: str) -> tuple[list[str], list[str]]:
    if path == "-":
        lines = sys.stdin.read().splitlines()
    else:
        with open(path, "r", encoding="utf-8") as fh:
            lines = fh.read().splitlines()
    names, docs = [], []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        parts = line.split(None, 1)
        names.append(parts[0])
        docs.append(parts[1].strip() if len(parts) > 1 else "")
    return names, docs


def dump_params_corpus(out=sys.stdout) -> None:
    """Write the in-repo parameter registry as a term_metrics corpus."""
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from trex_tpu.config.registry import Settings

    s = Settings()
    for name in sorted(s.names()):
        doc = (s.doc(name) or "").replace("\n", " ").strip()
        out.write(f"{name} {doc}\n".rstrip() + "\n")


def _print_search_rows(indexes, names, docs, top, title, other_rank=None):
    count = len(indexes) if top == 0 else min(top, len(indexes))
    print("")
    print(title.replace("<N>", str(count)))
    for i in range(count):
        idx = indexes[i]
        rank_note = ""
        if other_rank is not None and other_rank[idx] > 0:
            rank_note = f" (other {other_rank[idx]})"
        doc = docs[idx]
        if doc:
            print(f"{i + 1}{rank_note}\t[{names[idx]}]\t{shorten_text(doc, 100)}")
        else:
            print(f"{i + 1}{rank_note}\t[{names[idx]}]")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="TF-IDF term metrics and parameter text search "
                    "(term_metrics.cpp equivalent)")
    ap.add_argument("input", nargs="?", help="corpus file ('-' = stdin)")
    ap.add_argument("-i", "--input", dest="input_opt")
    ap.add_argument("-s", "--search", default="")
    ap.add_argument("-t", "--top", type=int, default=20)
    ap.add_argument("-m", "--min-freq", type=int, default=1)
    ap.add_argument("-b", "--by", default="importance",
                    choices=["importance", "idf", "freq", "tf", "docfreq", "df"])
    ap.add_argument("--choose-method", default="compare",
                    choices=["compare", "with-docs", "withdocs", "docs",
                             "names-only", "names", "no-docs", "nodocs"])
    ap.add_argument("--no-docs", action="store_true")
    ap.add_argument("--no-top-terms", action="store_true")
    ap.add_argument("--dump-params", action="store_true",
                    help="print the in-repo parameter registry as a corpus and exit")
    args = ap.parse_args(argv)

    if args.dump_params:
        dump_params_corpus()
        return 0

    path = args.input_opt or args.input
    if not path:
        ap.print_usage()
        print("Missing input file.", file=sys.stderr)
        return 1

    names, docs = load_corpus(path)
    if not names:
        print("Input corpus is empty.", file=sys.stderr)
        return 1

    method = args.choose_method
    if args.no_docs:
        method = "names-only"
    if method in ("withdocs", "docs"):
        method = "with-docs"
    if method in ("names", "no-docs", "nodocs"):
        method = "names-only"

    data = preprocess_corpus(names, docs)
    term_frequency: dict[str, int] = {}
    for tokens in data.tokenized_names:
        for t in tokens:
            term_frequency[t] = term_frequency.get(t, 0) + 1
    for tokens in data.tokenized_docs:
        for t in tokens:
            term_frequency[t] = term_frequency.get(t, 0) + 1

    sort_key = {"idf": "importance", "tf": "freq", "df": "docfreq"}.get(args.by, args.by)

    rows = []
    for term, df in data.doc_frequency.items():
        tf = term_frequency.get(term, 0)
        if tf < args.min_freq:
            continue
        rows.append((term, tf, df, data.term_importance.get(term, 0.0)))

    def metric(row):
        return {"freq": float(row[1]), "docfreq": float(row[2])}.get(sort_key, row[3])

    rows.sort(key=lambda r: (-metric(r), r[0]))
    display = len(rows) if args.top == 0 else min(args.top, len(rows))

    if not args.no_top_terms:
        print(f"Corpus entries: {len(names)}")
        print(f"Unique terms: {len(data.doc_frequency)}")
        suffix = "all rows" if args.top == 0 else f"{display} rows"
        print(f"Top terms by {sort_key} (min freq {args.min_freq}, {suffix})")
        print("")
        if display == 0:
            print("No terms match the selected filters.")
        else:
            term_width = max([4] + [min(len(r[0]), 28) for r in rows[:display]])
            max_metric = max(metric(r) for r in rows[:display])
            print("term\ttf\tdf\tidf\tbar")
            for r in rows[:display]:
                print(f"{truncate_term(r[0], term_width)}\t{r[1]}\t{r[2]}\t"
                      f"{r[3]:.3f}\t{make_bar(metric(r), max_metric, 30)}")

    if args.search:
        with_docs = (text_search(args.search, names, data, docs)
                     if method in ("compare", "with-docs") else [])
        names_only_data = preprocess_corpus(names)
        names_only = (text_search(args.search, names, names_only_data)
                      if method in ("compare", "names-only") else [])

        if method == "compare":
            rank_wd = [0] * len(names)
            rank_no = [0] * len(names)
            for i, idx in enumerate(with_docs):
                rank_wd[idx] = i + 1
            for i, idx in enumerate(names_only):
                rank_no[idx] = i + 1
            print("")
            print(f"Comparative search results for {args.search}")
            _print_search_rows(with_docs, names, docs, args.top,
                               "Method: with-docs (showing names-only rank <N>)",
                               other_rank=rank_no)
            _print_search_rows(names_only, names, docs, args.top,
                               "Method: names-only (showing with-docs rank, <N>)",
                               other_rank=rank_wd)
        elif method == "with-docs":
            _print_search_rows(with_docs, names, docs, args.top,
                               f"Search results (with-docs) for {args.search} (<N> shown)")
        else:
            _print_search_rows(names_only, names, docs, args.top,
                               f"Search results (names-only) for {args.search} (<N> shown)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
