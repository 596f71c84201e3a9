"""Text-analysis stages over document tables: language ID, quality
scoring, token counting, fingerprinting.

These are the large-scale training-data operations the engine adds
beyond the reference (which processes only abstract numeric features).
All stages are vectorized-or-amortized ``map_batches`` bodies; the
language-ID and tokenizer stages are callable classes (regexes + n-gram
profiles compiled once per actor).
"""

from __future__ import annotations

import hashlib
import re
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

# crude character-trigram profiles per language for the heuristic
# classifier; scores are log-frequency weights of very common trigrams
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng ",
           " to", "to ", "ed ", " in", "ion"),
    "de": ("der", "er ", " de", "ie ", "die", "und", " un", "nd ", "ein", "ich",
           "sch", "ch ", "en ", " ge", "ten"),
    "fr": (" de", "de ", "es ", " le", "le ", "ent", "nt ", "la ", " la", "et ",
           " et", "ion", "que", " qu", "les"),
    "es": (" de", "de ", "os ", " la", "la ", "el ", " el", "que", " qu", "ue ",
           "en ", " en", "ción", "ar ", "as "),
}

_STOPWORDS = frozenset(
    "the a an and or of to in on for with at by from is are was were be been "
    "it its as that this these those he she they we you i not no".split()
)

_TOKEN_RE = r"[A-Za-z]+(?:'[A-Za-z]+)?|[0-9]+|[^\sA-Za-z0-9]"

# lowercase word tokens; shared by QualityScorer and the word-count
# queries so the engine and the SQL oracles tokenize identically
WORD_RE = re.compile(r"[a-z']+")


class LanguageId:
    """Character-trigram language heuristic: score = fraction of the
    text's trigrams hitting each language's common-trigram set; emits the
    argmax language and its score. Profiles compile once per actor."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred") -> None:
        self.text_col = text_col
        self.out_col = out_col
        self.profiles = {
            lang: frozenset(tris) for lang, tris in _LANG_PROFILES.items()
        }

    def _score(self, text: str) -> tuple[str, float]:
        t = f" {text.lower()} "
        tris = [t[i:i + 3] for i in range(len(t) - 2)]
        if not tris:
            return "und", 0.0
        best_lang, best = "und", 0.0
        for lang, prof in self.profiles.items():
            hits = sum(1 for tri in tris if tri in prof)
            frac = hits / len(tris)
            if frac > best:
                best_lang, best = lang, frac
        return best_lang, best

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        langs, scores = [], []
        for t in texts:
            lang, s = self._score(t or "")
            langs.append(lang)
            scores.append(s)
        return batch.append_column(self.out_col, pa.array(langs, pa.string())) \
                    .append_column(f"{self.out_col}_score", pa.array(scores, pa.float64()))


class QualityScorer:
    """Document quality heuristics in ONE fused per-block pass: length,
    mean token length, punctuation ratio, stopword ratio, uppercase
    ratio, digit ratio, distinct-token ratio, PLUS the remaining Gopher
    document-filter signals (Rae et al. 2021 §A1.1 — repetition lives
    in repetition_stats): symbol-to-word ratio ('#' or '...' per
    word), bullet-start and ellipsis-end line fractions, and the
    fraction of whitespace words containing an alphabetic character —
    each with its Gopher rule boolean at the paper's thresholds
    (50<=words<=100k, 3<=mean word length<=10, symbol ratio<=0.1,
    bullet lines<=0.9, ellipsis lines<=0.3, alpha words>=0.8). Every
    ratio is a single IEEE division of exact integers, so the DuckDB
    oracle reproduces the doubles (and the rule booleans) bit-for-bit.
    Pandas vectorized string kernels."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        self.word_re = WORD_RE

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        batch["n_chars_q"] = s.str.len().astype("int64")
        toks = s.str.lower().str.findall(self.word_re)
        n_tok = toks.map(len)
        batch["n_tokens"] = n_tok.astype("int64")
        batch["mean_token_len"] = toks.map(
            lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0
        )
        batch["stopword_ratio"] = toks.map(
            lambda ws: sum(w in _STOPWORDS for w in ws) / len(ws) if ws else 0.0
        )
        batch["punct_ratio"] = (
            s.str.count(r"[^\w\s]").astype("float64") / s.str.len().clip(lower=1)
        )
        batch["upper_ratio"] = (
            s.str.count(r"[A-Z]").astype("float64") / s.str.len().clip(lower=1)
        )
        batch["digit_ratio"] = (
            s.str.count(r"[0-9]").astype("float64") / s.str.len().clip(lower=1)
        )
        batch["distinct_token_ratio"] = toks.map(
            lambda ws: len(set(ws)) / len(ws) if ws else 0.0
        )
        # --- Gopher §A1.1 line/symbol/word-shape rules (same pass) ---
        # symbol-to-word: '#' chars + non-overlapping '...' runs per
        # word (RE2 leftmost non-overlap counts match DuckDB's
        # regexp_extract_all on the same pattern)
        n_sym = (s.str.count("#") + s.str.count(r"\.{3}")).astype("int64")
        batch["symbol_word_ratio"] = (
            n_sym.astype("float64") / n_tok.clip(lower=1))
        lines = s.str.split("\n")
        batch["n_lines"] = lines.map(len).astype("int64")
        batch["bullet_line_frac"] = lines.map(
            lambda ls: sum(x.lstrip(" ").startswith(("-", "*", "•"))
                           for x in ls) / len(ls))
        batch["ellipsis_line_frac"] = lines.map(
            lambda ls: sum(x.rstrip(" ").endswith(("...", "…"))
                           for x in ls) / len(ls))
        # alphabetic-word fraction over WHITESPACE words (the WORD_RE
        # tokens are alphabetic by construction, so the Gopher rule
        # must look at raw whitespace words). Explicit ASCII class, NOT
        # \S: python re's \S is unicode-aware (excludes U+00A0 etc.)
        # while DuckDB's RE2 \S is ASCII — the explicit class reads
        # identically in both engines
        ws_words = s.str.findall(r"[^ \t\n\r\f\v]+")
        batch["alpha_word_frac"] = ws_words.map(
            lambda ws: (sum(any(c.isascii() and c.isalpha() for c in w)
                            for w in ws) / len(ws)) if ws else 0.0)
        batch["gopher_word_count_ok"] = (
            (batch["n_tokens"] >= 50) & (batch["n_tokens"] <= 100_000))
        batch["gopher_mean_word_ok"] = (
            (batch["mean_token_len"] >= 3.0)
            & (batch["mean_token_len"] <= 10.0))
        batch["gopher_symbol_ok"] = batch["symbol_word_ratio"] <= 0.1
        batch["gopher_bullet_ok"] = batch["bullet_line_frac"] <= 0.9
        batch["gopher_ellipsis_ok"] = batch["ellipsis_line_frac"] <= 0.3
        batch["gopher_alpha_ok"] = batch["alpha_word_frac"] >= 0.8
        return batch


def add_token_counts(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Whitespace tokens + BPE-ish subword-regex tokens per document
    (vectorized pandas string ops)."""
    bpe_re = re.compile(_TOKEN_RE)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("")
        batch["ws_tokens"] = s.str.split().map(len).astype("int64")
        batch["bpe_tokens"] = s.str.findall(bpe_re).map(len).astype("int64")
        return batch

    return ds.map_batches(fn, batch_format="pandas")


_RH_BASE = np.uint64(1000003)
# base is odd -> invertible mod 2^64; prefix-sum trick below needs it
_RH_BINV = np.uint64(pow(1000003, -1, 1 << 64))


def min_rolling_hash(data: bytes, window: int = 64) -> int:
    """Min over rolling polynomial (Rabin-Karp) hashes of
    ``window``-byte windows, mod 2^64 — a 1-gram winnowing fingerprint.

    Vectorized: H_i = base^(i+w-1) * (A_{i+w-1} - A_{i-1}) where
    A_j = sum d[t] * base^(-t); uint64 wraparound arithmetic makes the
    modular algebra free (no per-byte Python loop)."""
    d = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = d.size
    if n == 0:
        return 0
    with np.errstate(over="ignore"):
        powers = np.multiply.accumulate(
            np.concatenate([np.ones(1, np.uint64),
                            np.full(n - 1, _RH_BASE, np.uint64)]))
        if n <= window:
            h = np.uint64((d * powers[::-1]).sum())
            return int(h.view(np.int64))
        ipowers = np.multiply.accumulate(
            np.concatenate([np.ones(1, np.uint64),
                            np.full(n - 1, _RH_BINV, np.uint64)]))
        prefix = np.concatenate([np.zeros(1, np.uint64),
                                 np.cumsum(d * ipowers, dtype=np.uint64)])
        # windows start at i = 0..n-window
        hi = prefix[window:] - prefix[:-window]          # A_{i+w-1} - A_{i-1}
        h = np.uint64((powers[window - 1:] * hi).min())
    return int(h.view(np.int64))


def add_fingerprints(
    ds: ray.data.Dataset,
    text_col: str = "text",
    window: int = 64,
) -> ray.data.Dataset:
    """Document fingerprints: full-content md5 plus the min rolling
    polynomial hash (``min_rolling_hash``) — content-addressed identity
    for exact dedup at scale."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        md5s, rolls = [], []
        for t in texts:
            data = (t or "").encode()
            md5s.append(hashlib.md5(data).hexdigest())
            rolls.append(min_rolling_hash(data, window))
        return batch.append_column("md5", pa.array(md5s, pa.string())) \
                    .append_column("min_rolling_hash", pa.array(rolls, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def language_id(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    # stateless tasks: the trigram profiles build in ~1ms, so task-pool
    # elasticity beats actor-pool startup (actors only pay off for heavy
    # per-worker state like the decode stage)
    fn = LanguageId(text_col)
    return ds.map_batches(fn, batch_format="pyarrow")


def quality_scores(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    fn = QualityScorer(text_col)
    return ds.map_batches(fn, batch_format="pandas")


def pack_sequences(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    token_re: "re.Pattern | None" = None,
) -> ray.data.Dataset:
    """Greedy sequence packing for LLM training batches: documents are
    packed into sequences whose whitespace-token total stays <= 
    ``max_tokens`` (over-long documents become single truncation-marked
    sequences). Packing is PER BLOCK — the industry-standard
    approximation: a global optimal packing would serialize the corpus,
    while per-block first-fit-decreasing loses only a few percent fill
    and keeps the stage embarrassingly parallel. Emits one row per
    packed sequence: (seq_key, n_docs, total_tokens, truncated); seq_key
    is content-addressed (hash of member ids) so re-execution / resume
    emits identical rows."""
    from ..sketches import hash_any_array

    def pack(b: pd.DataFrame) -> pd.DataFrame:
        n_tok = b[text_col].fillna("").str.split().map(len).to_numpy()
        ids = b[id_col].to_numpy()
        order = np.argsort(-n_tok, kind="stable")  # first-fit-decreasing
        bins: list[list[int]] = []
        bin_tot: list[int] = []
        for i in order:
            t = int(n_tok[i])
            if t >= max_tokens:
                bins.append([i]); bin_tot.append(t)
                continue
            for bi in range(len(bins)):
                if bin_tot[bi] + t <= max_tokens:
                    bins[bi].append(i); bin_tot[bi] += t
                    break
            else:
                bins.append([i]); bin_tot.append(t)
        keys = hash_any_array([
            "|".join(str(ids[i]) for i in sorted(members)) for members in bins
        ]).astype(np.int64)
        return pd.DataFrame({
            "seq_key": keys,
            "n_docs": pd.Series([len(m) for m in bins], dtype="int64"),
            "total_tokens": pd.Series(bin_tot, dtype="int64"),
            "truncated": pd.Series([bin_tot[i] > max_tokens
                                    for i in range(len(bins))], dtype="bool"),
        })

    return ds.map_batches(pack, batch_format="pandas", batch_size=4096)


# GPT-2-style pre-tokenizer pattern, ASCII-scoped and lookahead-free so
# python re and DuckDB's RE2 count IDENTICALLY (the published GPT-2
# pattern uses \p{L} classes and a lookahead RE2 lacks): contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs,
# whitespace runs. The pattern partitions any ASCII text completely.
BPE_PRETOKEN_PATTERN = (
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9']+|\s+"
)


# PII redaction patterns — RE2-compatible (no lookaround/backrefs) so
# pyarrow.compute (RE2) and DuckDB's regexp_replace (also RE2) rewrite
# IDENTICALLY; applied in this fixed order (email before ipv4: an email
# domain can contain dotted digits).
PII_PATTERNS: "list[tuple[str, str, str]]" = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "[PHONE]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
]


def redact_pii(ds: ray.data.Dataset, text_col: str = "text",
               out_col: str | None = None) -> ray.data.Dataset:
    """Mask emails / phone numbers / IPv4 addresses in ``text_col`` —
    the standard pre-training text-cleaning pass. Fully vectorized:
    one ``pc.count_substring_regex`` + ``pc.replace_substring_regex``
    pair per pattern over the Arrow column (zero Python per row), so
    the stage streams at 100 TB like any other stateless map. Adds
    ``<out_col>`` (redacted text) and ``n_redactions`` (total masked
    spans per row)."""
    import pyarrow.compute as pc

    dst = out_col or f"{text_col}_redacted"

    def fn(batch: pa.Table) -> pa.Table:
        # null text redacts to "" with 0 masked spans (a null count would
        # otherwise poison the int64 cast)
        col = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        n = np.zeros(len(batch), dtype=np.int64)
        for _, pat, repl in PII_PATTERNS:
            n += np.asarray(
                pc.count_substring_regex(col, pat).to_numpy(
                    zero_copy_only=False), dtype=np.int64)
            col = pc.replace_substring_regex(col, pat, repl)
        return batch.append_column(dst, col).append_column(
            "n_redactions", pa.array(n, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def flag_contaminated(ds: ray.data.Dataset, benchmark_texts: "list[str]",
                      text_col: str = "text",
                      out_col: str = "contaminated") -> ray.data.Dataset:
    """Benchmark decontamination flag — the pretraining-curation pass
    that drops training documents containing evaluation-set text
    (public method: substring / n-gram overlap vs the benchmark set).

    Small benchmark sets (the common case: eval suites are MBs, the
    corpus is TBs) broadcast ONCE via ``ray.put`` and every block is
    scanned with vectorized ``pc.match_substring`` — one pass per
    benchmark string, zero Python per row, and only the boolean flag is
    added (the filter composes downstream). For benchmark sets too
    large to scan per-string, compose the hashed n-gram tier instead:
    ``add_fingerprints`` / ``min_rolling_hash`` bucket both sides and a
    semi-join drops colliding docs (same shape as dedup)."""
    import pyarrow.compute as pc

    bench_ref = ray.put(list(benchmark_texts))

    def fn(batch: pa.Table) -> pa.Table:
        from ..functions.broadcast import get_broadcast

        col = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        hit = np.zeros(len(batch), dtype=bool)
        # get_broadcast: deserialize the benchmark list once per worker,
        # not once per batch (a plain ray.get re-unpickles every call)
        for b in get_broadcast(bench_ref):
            hit |= np.asarray(pc.match_substring(col, b).to_numpy(
                zero_copy_only=False), dtype=bool)
        return batch.append_column(out_col, pa.array(hit, pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow")


# deterministic benchmark snippets for the decontamination demo query —
# shared with the generated SQL oracle (__ray_entry__) so the two sides
# can never desynchronize
DECON_BENCH: "list[str]" = [
    "which of the following best completes the passage answer",
    "select the correct option from the choices given below",
    "the assistant should respond with the letter of the answer",
]


# deterministic accented prefix planted by the normalization demo query —
# the synthetic corpus is pure ASCII, so without it the accent-stripping
# and unicode-normalization steps would be untested no-ops. Shared with
# the generated SQL oracle (__ray_entry__) so both sides plant the same
# bytes.
NORM_PROBE = "Café  MÜnchen\trésumé "


def normalize_text(ds: ray.data.Dataset, text_col: str = "text",
                   out_col: str | None = None) -> ray.data.Dataset:
    """Canonical text normalization — the standard pretraining-corpus
    cleaning pass (public method: unicode NFC/NFD normalize, strip
    accents, case-fold, collapse whitespace). Contract (mirrors DuckDB's
    ``lower(strip_accents(nfc_normalize(x)))`` + whitespace collapse so
    the oracle can verify bit-for-bit):

      0. strip NUL characters (control-char garbage; DuckDB's
         utf8proc-backed functions are NUL-truncating, so removing NUL
         FIRST is both the sane cleaning rule and what keeps the two
         sides comparable — caught by tools/fuzz_oracle.py --docs on an
         adversarial corpus with embedded NUL).
      1. NFD-decompose, drop combining marks (``\\p{Mn}``) — equivalent
         to DuckDB ``strip_accents`` for precomposed Latin input
         (decomposition leaves base letters; no recomposition needed).
      2. unicode lowercase.
      3. collapse ``\\s+`` runs to one space, trim ends.

    Fully vectorized: every step is one ``pyarrow.compute`` kernel over
    the Arrow column (utf8_normalize / replace_substring_regex /
    utf8_lower / utf8_trim_whitespace) — zero Python per row, streams at
    100 TB like any stateless map. Null text normalizes to ""."""
    import pyarrow.compute as pc

    dst = out_col or f"{text_col}_norm"

    def fn(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        col = pc.replace_substring(col, pattern="\x00", replacement="")
        col = pc.utf8_normalize(col, form="NFD")
        col = pc.replace_substring_regex(col, r"\p{Mn}", "")
        col = pc.utf8_lower(col)
        col = pc.replace_substring_regex(col, r"\s+", " ")
        col = pc.utf8_trim_whitespace(col)
        return batch.append_column(dst, col)

    return ds.map_batches(fn, batch_format="pyarrow")


def _block_gram_pairs(b: pd.DataFrame, n: int, text_col: str,
                      id_col: str) -> pd.DataFrame:
    """Per-block distinct (gram, doc_id, cnt) over the single-space
    token convention (NUL stripped first — utf8proc contract). Grams
    come from pure numpy shifts over the exploded token array
    (documents are contiguous after repeat(), so doc equality at lag
    n-1 marks validity — no per-row Python). Returns an EMPTY frame
    with the right dtypes when the block yields no positions."""
    empty = pd.DataFrame({
        "gram": pd.Series([], dtype=object),
        "doc_id": pd.Series([], dtype=np.int64),
        "cnt": pd.Series([], dtype=np.int64),
    })
    if not len(b):
        return empty
    txt = b[text_col].fillna("").astype(str) \
        .str.replace("\x00", "", regex=False)
    toks = txt.str.split(" ")
    ln = toks.map(len).to_numpy(dtype=np.int64)
    doc = np.repeat(b[id_col].to_numpy(dtype=np.int64), ln)
    flat = np.concatenate(toks.to_numpy()).astype(object)
    npos = len(flat) - n + 1
    if npos <= 0:
        return empty
    # contiguity => doc[i] == doc[i+n-1] implies all middles equal
    valid = doc[n - 1:] == doc[:-(n - 1)]
    gram = flat[:npos]
    for j in range(1, n):
        gram = gram + " "
        gram = gram + flat[j:j + npos]
    df = pd.DataFrame({"gram": gram[valid], "doc_id": doc[:npos][valid]})
    if not len(df):
        return empty
    agg = df.groupby(["gram", "doc_id"], sort=False).size() \
        .rename("cnt").reset_index()
    agg["cnt"] = agg.cnt.astype("int64")
    return agg


def ngram_doc_pairs(
    ds: ray.data.Dataset, n: int = 8, text_col: str = "text",
    id_col: str = "doc_id", n_buckets: int = 32,
    payload: str = "gram",
) -> ray.data.Dataset:
    """Distinct (token n-gram, document) pairs with per-doc occurrence
    counts — the exchange relation behind exact-substring (duplicated
    span) deduplication a la Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better"): a span duplicated across
    documents shows up as an n-gram whose distinct-doc count is >= 2.

    Tokens are the single-space-split convention shared with
    doc_token_stats / doc_repetition_stats; NUL bytes are stripped
    first (DuckDB's utf8proc-backed functions NUL-truncate, so removing
    NUL keeps engine and oracle comparable — same contract as
    normalize_text). Output columns: ``doc_id``, ``cnt`` (occurrences
    of the gram inside that doc), ``bucket`` (hash bucket so each gram
    lives wholly in one bucket after a groupby), plus — depending on
    ``payload`` — ``gram`` (the n tokens joined by one space) or ``h``
    (int64 view of the gram's FNV-64 hash, scalars only).

    Scale shape: one embarrassingly-parallel map_batches with per-block
    (gram, doc) dedup; a document never spans blocks, so per-block-
    distinct pairs are globally distinct and a downstream
    ``groupby("gram"|"h"|"bucket")`` sees exact per-doc counts.
    ``payload="gram"`` ships the gram STRINGS through the shuffle —
    fine up to corpus scales where the exchange fits the object store.
    ``payload="hash"`` is the 10^12-row path: the shuffle carries three
    int64 scalars per pair and dup-gram candidates are re-gathered
    bounded afterwards (dup_gram_candidate_pairs), the same
    scalars-only + bounded-re-gather hybrid minhash_lsh_pairs uses.
    """
    from ..sketches import hash_any_array

    assert n >= 2
    assert payload in ("gram", "hash")

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        agg = _block_gram_pairs(b, n, text_col, id_col)
        h = hash_any_array(agg.gram.to_numpy(dtype=object))
        agg["bucket"] = (h % np.uint64(n_buckets)).astype(np.int64)
        if payload == "hash":
            agg["h"] = h.view(np.int64)
            return agg[["h", "doc_id", "cnt", "bucket"]]
        return agg[["gram", "doc_id", "cnt", "bucket"]]

    return ds.map_batches(fn, batch_format="pandas", batch_size=65536)


def dup_gram_candidate_pairs(
    ds: ray.data.Dataset, n: int = 8, text_col: str = "text",
    id_col: str = "doc_id", candidate_gate: int = 2_000_000,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """(gram, doc_id, cnt) rows restricted to CANDIDATE duplicated
    grams, found via the scalars-only shuffle: pass 1 ships (h, doc_id)
    int64 pairs and flags hashes seen on >= 2 rows per bucket; pass 2
    re-scans the corpus emitting the string pairs ONLY for grams whose
    hash is in the flagged set (broadcast once via ray.put, membership
    by vectorized searchsorted). The candidate set is a SUPERSET of the
    true dup grams (hash collisions and multi-gram-per-doc collisions
    only ever add candidates), so an exact downstream
    ``groupby("gram")`` keeps correctness bit-identical to the
    string-shuffle path — path-agreement is pytest-pinned.

    Bound: |candidates| <= #true-dup grams + expected collisions
    (#grams^2 / 2^64, negligible). ``candidate_gate`` fails loudly if
    an adversarial corpus exceeds the driver's candidate budget —
    resize or fall back to ngram_doc_pairs(payload="gram")."""
    import ray as _ray

    from ..functions.broadcast import get_broadcast
    from ..sketches import hash_any_array

    pairs_h = ngram_doc_pairs(ds, n=n, text_col=text_col, id_col=id_col,
                              payload="hash")

    def bucket_cand(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("h", sort=False)["doc_id"].size()
        return pd.DataFrame({"h": c.index[c.to_numpy() >= 2]})

    cand = pairs_h.groupby("bucket").map_groups(
        bucket_cand, batch_format="pandas").to_pandas()
    if len(cand) > candidate_gate:
        raise ValueError(
            f"dup-gram candidate set ({len(cand)} hashes) exceeds the "
            f"driver gate ({candidate_gate}); raise candidate_gate or "
            "use ngram_doc_pairs(payload='gram')")
    # a zero-dup corpus materializes with NO columns, not an empty 'h'
    hset_ref = _ray.put(np.sort(cand.h.to_numpy(dtype=np.int64))
                        if "h" in cand.columns
                        else np.empty(0, dtype=np.int64))

    def regather(b: pd.DataFrame) -> pd.DataFrame:
        hset = get_broadcast(hset_ref)
        agg = _block_gram_pairs(b, n, text_col, id_col)
        hu = hash_any_array(agg.gram.to_numpy(dtype=object))
        agg["bucket"] = (hu % np.uint64(n_buckets)).astype(np.int64)
        h = hu.view(np.int64)
        idx = np.searchsorted(hset, h)
        idx[idx >= len(hset)] = max(len(hset) - 1, 0)
        keep = (hset[idx] == h) if len(hset) else np.zeros(len(h), bool)
        return agg[keep]

    return ds.map_batches(regather, batch_format="pandas",
                          batch_size=65536)


# ---------------------------------------------------------------------------
# BPE merge learning (tokenizer training)
# ---------------------------------------------------------------------------

BPE_VOCAB_GATE = 50_000_000


def learn_bpe_merges(words: "list[str]", counts: np.ndarray,
                     k: int = 8) -> pd.DataFrame:
    """Learn ``k`` BPE merges from a (word, count) table — the merge
    loop of byte-pair-encoding tokenizer training (Sennrich et al.
    2016). Operates on the BOUNDED distinct-word table, exactly like
    production trainers (the corpus-sized work is the distributed word
    count that produces the table; the loop itself is vocab-sized).

    Conventions (shared bit-for-bit with the SQL oracle):
    - pair counting weights every ADJACENT symbol pair by its word's
      corpus count, overlaps included ('aaa' has two (a,a) pairs);
    - selection is (count DESC, pair ASC) — pair compare is bytewise
      on the encoded 2-char string, which equals the numeric
      (char1, char2) order because all symbols are single-byte;
    - merge i is encoded as chr('A'+i-1), so every symbol stays ONE
      character and applying a merge is a plain leftmost
      non-overlapping substring replace ('abab' -> 'AA', 'aaa' ->
      'Aa') with no boundary ambiguity;
    - stops early when no pair remains (k capped at 26 merge chars).

    Each iteration is one vectorized pass: the vocab joins into a
    single NUL-sentineled string, char codes come from a utf-32 view,
    pair codes pack into uint64 and np.bincount folds the weighted
    counts — no per-pair Python. Only the merge APPLICATION is a
    str.replace loop over the (bounded) vocab."""
    if k > 26:
        raise ValueError("learn_bpe_merges: k > 26 merge chars")
    counts = np.asarray(counts, dtype=np.int64)
    words = list(words)
    exp: dict[str, str] = {}
    rows = []
    for i in range(k):
        lens = pd.Series(words, dtype=object).str.len() \
            .to_numpy(dtype=np.int64) if words else np.empty(0, np.int64)
        keep = lens >= 2
        if not keep.any():
            break
        ws = [w for w, kp in zip(words, keep) if kp]
        cs, ls = counts[keep], lens[keep]
        joined = "\x00".join(ws)
        codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        wid = np.full(len(codes), -1, dtype=np.int64)
        wid[codes != 0] = np.repeat(np.arange(len(ws)), ls)
        valid = (codes[:-1] != 0) & (codes[1:] != 0)
        if not valid.any():
            break
        pair_code = ((codes[:-1].astype(np.uint64) << np.uint64(32))
                     | codes[1:].astype(np.uint64))[valid]
        w = cs[wid[:-1][valid]]
        u, inv = np.unique(pair_code, return_inverse=True)
        totals = np.bincount(inv, weights=w).astype(np.int64)
        b = np.lexsort((u, -totals))[0]
        c1 = chr(int(u[b] >> np.uint64(32)))
        c2 = chr(int(u[b] & np.uint64(0xFFFFFFFF)))
        pair, char = c1 + c2, chr(ord("A") + i)
        expansion = exp.get(c1, c1) + exp.get(c2, c2)
        exp[char] = expansion
        rows.append({"rank": np.int64(i + 1), "pair": pair,
                     "pair_count": np.int64(totals[b]),
                     "expansion": expansion})
        words = [wd.replace(pair, char) for wd in words]
    return pd.DataFrame(rows, columns=["rank", "pair", "pair_count",
                                       "expansion"]) \
        if rows else pd.DataFrame({
            "rank": pd.Series([], dtype=np.int64),
            "pair": pd.Series([], dtype=object),
            "pair_count": pd.Series([], dtype=np.int64),
            "expansion": pd.Series([], dtype=object)})


def apply_bpe_merges(words: "list[str]", pairs: "list[str]") -> "list[str]":
    """Apply learned BPE merges (in rank order) to each word: merge i
    replaces its 2-char pair with chr('A'+i) via leftmost
    non-overlapping ``str.replace`` — the exact apply convention of
    ``learn_bpe_merges`` and of the SQL oracle's unrolled replace()
    stages, so encoded length == BPE token count (all symbols stay
    single-byte)."""
    out = list(words)
    for i, p in enumerate(pairs):
        ch = chr(ord("A") + i)
        out = [w.replace(p, ch) for w in out]
    return out
