"""Text analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All stateless, vectorized ``map_batches`` bodies over a string column
(regexes compiled at module import — once per worker process; an actor
pool variant is unnecessary because there is no per-stage mutable state).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = re.compile(r"\S+")
WORD_RE = re.compile(r"[A-Za-zÀ-ÿ']+")
# BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs (public
# GPT-2-style pattern simplified to stdlib `re`)
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "para", "en", "que"},
}


def token_count(texts: np.ndarray) -> np.ndarray:
    return np.fromiter(
        (len(TOKEN_RE.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts)
    )


def bpe_token_count(texts: np.ndarray) -> np.ndarray:
    return np.fromiter(
        (len(BPE_RE.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts)
    )


def token_count_op(text_col: str = "text"):
    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "n_tokens", pa.array(token_count(texts), type=pa.int64())
        ).append_column(
            "n_bpe_tokens", pa.array(bpe_token_count(texts), type=pa.int64())
        )

    return fn


def repetition_stats_op(text_col: str = "text", id_col: str = "doc_id"):
    """Per-document repetition statistics — the classic repetition quality
    filter of large-corpus curation (fraction of duplicated tokens; a high
    value flags boilerplate / degenerate generations): ``n_tokens``,
    ``n_distinct`` and ``dup_frac = 1 - distinct/total``. Documents with
    zero tokens are dropped (no repetition signal).

    Per-batch only (no exchange): Arrow whitespace split + one pandas
    groupby(count, nunique) over the exploded (row, token) pairs."""
    import pandas as pd

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(t[text_col])
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        row_ix = np.repeat(np.arange(t.num_rows), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "row": row_ix[keep],
            "tok": flat.to_numpy(zero_copy_only=False)[keep],
        })
        g = df.groupby("row", sort=True)["tok"].agg(["count", "nunique"])
        rows = pa.array(g.index.to_numpy())
        n = g["count"].to_numpy().astype(np.int64)
        d = g["nunique"].to_numpy().astype(np.int64)
        return pa.table({
            id_col: t[id_col].take(rows),
            "n_tokens": pa.array(n, type=pa.int64()),
            "n_distinct": pa.array(d, type=pa.int64()),
            "dup_frac": pa.array(1.0 - d / n.astype(np.float64),
                                 type=pa.float64()),
        })

    return fn


def quality_score_op(text_col: str = "text"):
    """Length / punctuation / word-ratio quality features + a composite
    score in [0, 1]. Pure Arrow kernels where possible."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_numpy(zero_copy_only=False)
        n_chars = pc.utf8_length(t[text_col])
        toks = [TOKEN_RE.findall(s or "") for s in texts]
        n_tok = np.array([len(x) for x in toks], dtype=np.int64)
        mean_tok_len = np.array(
            [np.mean([len(w) for w in x]) if x else 0.0 for x in toks]
        )
        alpha = np.array(
            [sum(c.isalpha() or c.isspace() for c in (s or "")) for s in texts],
            dtype=np.float64,
        )
        nc = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
        alpha_ratio = np.divide(alpha, nc, out=np.zeros_like(alpha), where=nc > 0)
        score = (
            np.clip(n_tok, 0, 100) / 100 * 0.4
            + np.clip(mean_tok_len, 0, 10) / 10 * 0.2
            + alpha_ratio * 0.4
        )
        return (
            t.append_column("n_tokens", pa.array(n_tok, type=pa.int64()))
            .append_column("mean_token_len", pa.array(mean_tok_len, type=pa.float64()))
            .append_column("alpha_ratio", pa.array(alpha_ratio, type=pa.float64()))
            .append_column("quality_score", pa.array(score, type=pa.float64()))
        )

    return fn


LANG_WORD_CLASS = "[a-zà-ÿ']"  # post-lowercase word characters


def lang_id_op(text_col: str = "text"):
    """Stopword-profile language ID: the language whose stopword set
    covers the largest fraction of words wins (dict order breaks ties);
    'und' (undetermined) if no stopword hits at all.

    Fully vectorized: lowercase + regex word split are single Arrow
    kernels over the batch, per-language stopword membership is one
    ``pc.is_in`` over the flattened word array, per-doc hit counts come
    from cumsum differences at the list offsets — no per-row Python."""
    lang_names = list(STOPWORDS)
    sw_sets = {lang: pa.array(sorted(sw)) for lang, sw in STOPWORDS.items()}
    lang_arr = np.array(lang_names, dtype=object)

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        col = pc.fill_null(t[text_col], "")
        lists = pc.split_pattern_regex(pc.utf8_lower(col), "[^a-zà-ÿ']+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        offsets = lists.offsets.to_numpy().astype(np.int64)

        def seg_counts(mask: pa.Array) -> np.ndarray:
            m = mask.to_numpy(zero_copy_only=False).astype(np.int64)
            cum = np.zeros(len(m) + 1, dtype=np.int64)
            np.cumsum(m, out=cum[1:])
            return cum[offsets[1:]] - cum[offsets[:-1]]

        n_words = seg_counts(pc.not_equal(flat, ""))
        hits = np.zeros((len(lang_names), n), dtype=np.int64)
        for li, lang in enumerate(lang_names):
            hits[li] = seg_counts(pc.is_in(flat, value_set=sw_sets[lang]))
        best = np.argmax(hits, axis=0)  # first max wins = dict-order ties
        best_hits = hits[best, np.arange(n)]
        langs = np.where(best_hits > 0, lang_arr[best], "und")
        confs = np.where(n_words > 0, best_hits / np.maximum(n_words, 1), 0.0)
        return t.append_column(
            "lang_pred", pa.array(langs, type=pa.string())
        ).append_column("lang_conf", pa.array(confs, type=pa.float64()))

    return fn


def fingerprint64(texts: np.ndarray) -> np.ndarray:
    """64-bit document content fingerprint: blake2b-8 digest (C-speed per
    document, deterministic across processes)."""
    import hashlib

    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b((s or "").encode("utf-8"), digest_size=8).digest(), "big"
            )
            for s in texts
        ),
        dtype=np.uint64,
        count=len(texts),
    )


def fingerprint_md5(texts: np.ndarray) -> list:
    """Full 128-bit md5 hex fingerprint per document (C-speed per doc).
    The digest family a deployment picks is a config knob; md5 is offered
    because every SQL engine can recompute it for auditing."""
    import hashlib

    return [hashlib.md5((s or "").encode("utf-8")).hexdigest() for s in texts]


def fingerprint_op(text_col: str = "text", algo: str = "blake2b64"):
    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_numpy(zero_copy_only=False)
        if algo == "md5":
            fp = pa.array(fingerprint_md5(texts), type=pa.string())
        else:
            fp = pa.array(fingerprint64(texts).view(np.int64), type=pa.int64())
        return t.append_column("fingerprint", fp)

    return fn


def token_counts(ds, text_col: str):
    """Global (token, cnt) frequency table as a Dataset.

    Scale shape (combiner pattern): each batch pre-aggregates its own
    token counts with Arrow ``value_counts`` (zero-copy split + flatten,
    no Python per row), so the ONE ``groupby(token)`` exchange carries
    per-batch DISTINCT tokens, not raw token occurrences — shuffle volume
    is bounded by vocabulary size × batches, independent of corpus length.
    """

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.utf8_split_whitespace(t[text_col]))
        toks = toks.drop_null().filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(toks)
        return pa.table({
            "token": vc.field("values"),
            "cnt": pc.cast(vc.field("counts"), pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .sum("cnt")
        .map_batches(
            lambda t: t.rename_columns(["token", "cnt"]),
            batch_format="pyarrow",
        )
    )


def vocab_topk(ds, text_col: str, k: int):
    """Top-k corpus vocabulary by global token count (deterministic ties:
    count desc, token asc) — the "build a vocabulary / frequency table"
    corpus-stats step of a training-data pipeline. The final sort runs on
    the aggregated vocabulary only (see :func:`token_counts`)."""
    return (token_counts(ds, text_col)
            .sort(["cnt", "token"], descending=[True, False]).limit(k))


def unigram_freq_score(ds, text_col: str, id_col: str, *,
                       method: str = "broadcast", top_v: int = 1 << 20,
                       n_buckets: int = 64):
    """Unigram-LM-style corpus-frequency score per document — the
    "word-frequency quality filter" of a training-data pipeline: docs
    made of globally rare tokens (OCR noise, lang-ID misses, boilerplate
    hashes) score low. Two-pass: (1) global token frequency table
    (:func:`token_counts`), (2) per-doc lookup + aggregate. Emits
    ``(id, n_tokens, min_tok_cnt, avg_tok_cnt)`` — min/avg corpus count
    of the doc's tokens (occurrence-weighted). All aggregation is exact
    int64 (order-free partials); the ONE division per doc happens at the
    end, so results are bit-identical to the SQL mirror. Zero-token docs
    are dropped (SQL-join semantics). Uses mean FREQUENCY rather than
    mean log-probability so the score is exact under any merge order;
    it ranks docs identically to additive-smoothed unigram likelihood
    for filtering purposes.

    ``method="broadcast"``: the top ``top_v`` tokens by count are
    broadcast once (``ray.put``) and looked up per batch via one
    ``searchsorted`` — the fast path; tokens outside the cap floor at
    cnt=1 (a lower bound for any real token; the cap never binds below
    ~1M-token vocabularies). ``method="join"``: exact at any vocabulary
    size — per-doc distinct tokens (with occurrence counts) flow through
    one hash-partitioned equi-join against the frequency table, then one
    combiner-style groupby(id); shuffle volume is per-doc distinct
    tokens, never raw corpus length."""
    import ray
    import ray.data as rd

    counts = token_counts(ds, text_col)

    def _flat_tokens(t: pa.Table):
        tl = pc.utf8_split_whitespace(t[text_col])
        flat = pc.list_flatten(tl)
        parent = pc.list_parent_indices(tl)
        mask = pc.and_(pc.is_valid(flat), pc.not_equal(flat, ""))
        ftok = flat.filter(mask).to_numpy(zero_copy_only=False)
        fpar = parent.filter(mask).to_numpy(zero_copy_only=False)
        return ftok, fpar

    if method == "join":
        def explode(t: pa.Table) -> pa.Table:
            ftok, fpar = _flat_tokens(t)
            ids = t[id_col].to_numpy(zero_copy_only=False)[fpar]
            df = pd.DataFrame({id_col: ids, "token": ftok})
            g = (df.groupby([id_col, "token"], sort=False)
                 .size().rename("occ").reset_index())
            return pa.Table.from_pandas(g, preserve_index=False)

        from vertex_ray.stages.join import hash_join

        joined = hash_join(
            ds.map_batches(explode, batch_format="pyarrow"), counts,
            left_on="token", right_on="token", n_buckets=n_buckets)

        def partial_doc(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                id_col: t[id_col].to_numpy(zero_copy_only=False),
                "occ": t["occ"].to_numpy(zero_copy_only=False),
                "wc": (t["occ"].to_numpy(zero_copy_only=False)
                       * t["cnt"].to_numpy(zero_copy_only=False)),
                "mn": t["cnt"].to_numpy(zero_copy_only=False),
            })
            g = (df.groupby(id_col, sort=False)
                 .agg(n=("occ", "sum"), s=("wc", "sum"), m=("mn", "min"))
                 .reset_index())
            return pa.Table.from_pandas(g, preserve_index=False)

        def final_doc(g: pd.DataFrame) -> pd.DataFrame:
            r = (g.groupby(id_col, sort=False)
                 .agg(n_tokens=("n", "sum"), __s=("s", "sum"),
                      min_tok_cnt=("m", "min")).reset_index())
            r["avg_tok_cnt"] = (r["__s"].to_numpy(np.float64)
                                / r["n_tokens"].to_numpy(np.int64))
            return r[[id_col, "n_tokens", "min_tok_cnt", "avg_tok_cnt"]]

        return (joined.map_batches(partial_doc, batch_format="pyarrow")
                .groupby(id_col).map_groups(final_doc,
                                            batch_format="pandas"))

    if method != "broadcast":
        raise ValueError(f"unknown unigram_freq_score method: {method}")

    top = (counts.sort(["cnt", "token"], descending=[True, False])
           .limit(top_v).to_pandas())
    if "token" not in top.columns:  # empty corpus: typed empty vocabulary
        top = pd.DataFrame({"token": np.array([], dtype=object),
                            "cnt": np.array([], dtype=np.int64)})
    toks = top["token"].to_numpy()
    order = np.argsort(toks)
    ref = ray.put((toks[order], top["cnt"].to_numpy()[order]))

    def score(t: pa.Table) -> pa.Table:
        vocab, cnts = ray.get(ref)
        ftok, fpar = _flat_tokens(t)
        if len(vocab):
            pos = np.searchsorted(vocab, ftok)
            posc = np.minimum(pos, len(vocab) - 1)
            hit = vocab[posc] == ftok
            c = np.where(hit, cnts[posc], 1).astype(np.int64)
        else:  # cap of 0 / empty corpus: every token floors at cnt=1
            c = np.ones(len(ftok), dtype=np.int64)
        # parent indices are non-decreasing -> reduceat segments (exact
        # int64 sums / mins, no float accumulation)
        if len(fpar) == 0:
            return pa.table({id_col: pa.array([], t[id_col].type),
                             "n_tokens": pa.array([], pa.int64()),
                             "min_tok_cnt": pa.array([], pa.int64()),
                             "avg_tok_cnt": pa.array([], pa.float64())})
        new = np.ones(len(fpar), dtype=bool)
        new[1:] = fpar[1:] != fpar[:-1]
        starts = np.flatnonzero(new)
        docs = fpar[starts]
        n_tok = np.diff(np.append(starts, len(fpar)))
        s = np.add.reduceat(c, starts)
        mn = np.minimum.reduceat(c, starts)
        ids = t[id_col].to_numpy(zero_copy_only=False)[docs]
        return pa.table({
            id_col: pa.array(ids, t[id_col].type),
            "n_tokens": pa.array(n_tok.astype(np.int64)),
            "min_tok_cnt": pa.array(mn),
            "avg_tok_cnt": pa.array(s.astype(np.float64) / n_tok),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def decontaminate(candidates, benchmark, text_col: str, id_col: str, *,
                  k: int = 3, min_overlap: int = 1,
                  max_bench_grams: int = 50_000_000):
    """Benchmark decontamination — flag training docs sharing ≥
    ``min_overlap`` distinct word k-grams with a held-out benchmark set
    (the step every training-data pipeline runs before a model sees the
    corpus).

    Scale shape: the benchmark side (eval sets — small by definition) is
    reduced per batch to its distinct gram hashes, streamed to the driver
    (bounded by ``max_bench_grams``, asserted), sorted once, and broadcast
    with ``ray.put``; the candidate corpus then STREAMS through one
    ``map_batches`` that hashes its own grams vectorized (no gram strings
    materialized — see dedup_near._gram_hashes) and counts membership with
    one ``searchsorted`` per batch. The 100-TB side never shuffles.
    Matching is on 64-bit gram hashes: collisions vs the string-equality
    oracle are possible in principle, negligible in practice.
    """
    import ray

    from vertex_ray.stages.dedup_near import _gram_hashes

    def bench_grams(t: pa.Table) -> pa.Table:
        g, _ = _gram_hashes(t[text_col].to_pylist(), k)
        return pa.table({"g": pa.array(np.unique(g))})

    parts = [
        b["g"].to_numpy()
        for b in benchmark.map_batches(bench_grams, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    bench = (np.unique(np.concatenate(parts)) if parts
             else np.zeros(0, dtype=np.uint64))
    if len(bench) > max_bench_grams:
        raise ValueError(
            f"benchmark gram set ({len(bench)}) exceeds max_bench_grams="
            f"{max_bench_grams}; a set this large should be joined, not "
            "broadcast")
    ref = ray.put(bench)

    def score(t: pa.Table) -> pa.Table:
        b = ray.get(ref)
        n = len(t)
        grams, counts = _gram_hashes(t[text_col].to_pylist(), k)
        doc_of = np.repeat(np.arange(n), counts)
        idx = np.searchsorted(b, grams)
        hit = np.zeros(len(grams), dtype=bool)
        inb = idx < len(b)
        hit[inb] = b[idx[inb]] == grams[inb]
        overlap = np.bincount(doc_of[hit], minlength=n).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            "n_grams": pa.array(counts),
            "n_overlap": pa.array(overlap),
            "contaminated": pa.array(overlap >= min_overlap),
        })

    return candidates.map_batches(score, batch_format="pyarrow")


def _doc_token_tf(t: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """Per-document term frequencies for one batch: (id, token, tf) with
    one Arrow lower+split pass and a C-level pandas groupby — a document
    never spans batches, so tf is complete without any exchange."""
    import pandas as pd

    lists = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), r"\s+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    off = lists.offsets.to_numpy().astype(np.int64)
    doc_of = np.repeat(np.arange(len(t)), np.diff(off))
    toks = flat.to_numpy(zero_copy_only=False)
    keep = toks != ""
    df = (
        pd.DataFrame({"d": doc_of[keep], "token": toks[keep]})
        .groupby(["d", "token"], sort=False).size().reset_index(name="tf")
    )
    ids = t[id_col].to_numpy(zero_copy_only=False)[df["d"].to_numpy()]
    return pa.table({
        id_col: pa.array(ids),
        "token": pa.array(df["token"].to_numpy(), type=pa.string()),
        "tf": pa.array(df["tf"].to_numpy().astype(np.int64)),
    })


def tfidf_top_terms(ds, text_col: str, id_col: str, k: int = 3):
    """Top-k characteristic terms per document by tf·idf — ranked by the
    EXACT ratio tf/df (monotone in tf·idf for fixed corpus size, and IEEE
    double division is bit-identical in numpy and the SQL oracle, so the
    comparison needs no epsilon); ties break on token asc.

    Composition of three scale-shaped operators, no new exchange types:
      1. per-batch (id, token, tf) — no shuffle (a doc never spans batches)
      2. document frequency: combiner pre-aggregation → one groupby(token)
      3. stages/join.hash_join (token, df) back onto the tf triples —
         co-partitioned, because at corpus scale the vocabulary is itself
         too big to broadcast
      4. stages/ops.topk_per_group per document
    """
    from vertex_ray.stages.join import hash_join
    from vertex_ray.stages.ops import topk_per_group

    tf = ds.map_batches(
        lambda t: _doc_token_tf(t, text_col, id_col), batch_format="pyarrow")

    def df_partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["token"])
        return pa.table({
            "token": vc.field("values"),
            "df": pc.cast(vc.field("counts"), pa.int64()),
        })

    df = (
        tf.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token").sum("df")
        .map_batches(lambda t: t.rename_columns(["token", "df"]),
                     batch_format="pyarrow")
    )

    joined = hash_join(tf, df, "token")

    def score(t: pa.Table) -> pa.Table:
        ratio = (t["tf"].to_numpy().astype(np.float64)
                 / t["df"].to_numpy().astype(np.float64))
        return t.append_column("score", pa.array(ratio))

    scored = joined.map_batches(score, batch_format="pyarrow")
    out = topk_per_group(scored, id_col, "score", k, "token",
                         keep_cols=["tf", "df"])
    return out.map_batches(
        lambda t: t.select([id_col, "token", "tf", "df"]),
        batch_format="pyarrow")


def _doc_bigrams(t: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """Per-batch (id, bigram, occ): adjacent lowered-token pairs WITH
    multiplicity, pre-aggregated within the batch (combiner) so the
    downstream exchanges carry distinct bigrams, not occurrences."""
    import pandas as pd

    lists = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), r"\s+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    off = lists.offsets.to_numpy().astype(np.int64)
    doc_of = np.repeat(np.arange(len(t)), np.diff(off))
    toks = flat.to_numpy(zero_copy_only=False)
    keep = toks != ""
    toks, doc_of = toks[keep], doc_of[keep]
    if len(toks) < 2:
        return pa.table({id_col: pa.array([], t[id_col].type),
                         "bigram": pa.array([], pa.string()),
                         "occ": pa.array([], pa.int64())})
    same = doc_of[:-1] == doc_of[1:]
    bg = np.char.add(np.char.add(toks[:-1].astype(str), " "),
                     toks[1:].astype(str))[same]
    d = doc_of[:-1][same]
    df = (pd.DataFrame({"d": d, "bigram": bg})
          .groupby(["d", "bigram"], sort=False).size().reset_index(name="occ"))
    ids = t[id_col].to_numpy(zero_copy_only=False)[df["d"].to_numpy()]
    return pa.table({
        id_col: pa.array(ids),
        "bigram": pa.array(df["bigram"].to_numpy(), type=pa.string()),
        "occ": pa.array(df["occ"].to_numpy().astype(np.int64)),
    })


def bigram_freq_score(ds, text_col: str, id_col: str):
    """Corpus-frequency document score — the train-then-score shape of
    model-based quality filtering, with an integer-exact "model" so the
    result is bit-checkable against SQL: TRAIN = global bigram occurrence
    counts over the corpus (one combiner groupby — the vocabulary² table
    stays distributed); SCORE = each document's Σ over its adjacent token
    pairs of the global count of that pair (multiplicity × count), via a
    co-partitioned join on the bigram — never broadcast, because a corpus
    bigram table at 100 TB is itself huge. High score ⇒ the document is
    made of corpus-common constructions (fluent/boilerplate); low ⇒ rare
    text. Output: (id, n_pairs, score); docs with < 2 tokens have no pairs
    and are absent, like the SQL inner join."""
    from vertex_ray.stages.join import hash_join

    pairs = ds.map_batches(
        lambda t: _doc_bigrams(t, text_col, id_col), batch_format="pyarrow")

    def cnt_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = (pd.DataFrame({
            "bigram": t["bigram"].to_numpy(zero_copy_only=False),
            "c": t["occ"].to_numpy(),
        }).groupby("bigram", sort=False)["c"].sum().reset_index())
        return pa.table({
            "bigram": pa.array(df["bigram"].to_numpy(), type=pa.string()),
            "c": pa.array(df["c"].to_numpy().astype(np.int64)),
        })

    model = (
        pairs.map_batches(cnt_partial, batch_format="pyarrow")
        .groupby("bigram").sum("c")
        .map_batches(lambda t: t.rename_columns(["bigram", "c"]),
                     batch_format="pyarrow")
    )

    joined = hash_join(pairs, model, "bigram")

    def weigh(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col],
            "n_pairs": t["occ"],
            "score": pa.array(t["occ"].to_numpy() * t["c"].to_numpy()),
        })

    return (
        joined.map_batches(weigh, batch_format="pyarrow")
        .groupby(id_col).sum(["n_pairs", "score"])
        .map_batches(lambda t: t.rename_columns([id_col, "n_pairs", "score"]),
                     batch_format="pyarrow")
    )


def stitch_conversations(ds, key_col: str, order_col: str, text_col: str,
                         sep: str = "\n", n_buckets: int = 64):
    """Assemble one training sample per conversation: turns sorted by
    ``order_col`` within each ``key_col`` group, text joined with ``sep``
    — the transcripts → documents step of a conversational-data pipeline.

    Scale shape: conversations are hash-bucketed so ONE exchange moves
    each turn once and each task stitches ~n_convs/n_buckets whole
    conversations with a single vectorized sort + C-level pandas
    group-join (no task-per-conversation overhead). Partitioning
    assumption: one conversation fits one task — the same bound the
    rollup's bucket groups already rely on.
    """
    import pandas as pd

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False)
        b = (pd.util.hash_array(np.ascontiguousarray(k))
             % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, order_col], kind="stable")
        agg = g.groupby(key_col, sort=False).agg(
            n_turns=(order_col, "size"), doc=(text_col, sep.join))
        return agg.reset_index()[[key_col, "n_turns", "doc"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(stitch, batch_format="pandas")
    )


def chunk_documents(ds, text_col: str, id_col: str, size: int,
                    stride: int | None = None):
    """Split documents into fixed-token-count chunks (the chunking step of
    an embedding / retrieval pipeline). ``stride`` < ``size`` gives
    overlapping windows; default non-overlapping (= size).

    Vectorized shape: one Arrow split pass per batch, within-doc token
    positions by offset arithmetic, chunk membership by integer division
    (np.repeat expansion for overlap), then a single C-level pandas
    group-join builds the chunk strings — no Python loop over tokens.
    A document never spans batches, so there is NO exchange at all.
    """
    import pandas as pd

    stride = stride or size
    if stride > size:
        raise ValueError("stride must be <= size")

    def fn(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(t[text_col], r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        off = lists.offsets.to_numpy().astype(np.int64)
        doc_of = np.repeat(np.arange(len(t)), np.diff(off))
        toks = flat.to_numpy(zero_copy_only=False)
        keep = toks != ""
        toks, doc_of = toks[keep], doc_of[keep]
        if not len(toks):
            return pa.table({id_col: pa.array([], t[id_col].type),
                             "chunk_idx": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string())})
        starts = np.zeros(len(t) + 1, dtype=np.int64)
        np.cumsum(np.bincount(doc_of, minlength=len(t)), out=starts[1:])
        pos = np.arange(len(toks)) - starts[doc_of]
        # chunk ids covering position p: from max(0, ceil((p-size+1)/stride))
        # to p // stride — one row per (token, covering chunk)
        first = np.maximum(0, -(-(pos - size + 1) // stride))
        last = pos // stride
        reps = (last - first + 1).astype(np.int64)
        tok_rep = np.repeat(np.arange(len(toks)), reps)
        within = np.arange(int(reps.sum())) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
        chunk_of = first[tok_rep] + within
        df = pd.DataFrame({
            "d": doc_of[tok_rep],
            "chunk_idx": chunk_of,
            "t": toks[tok_rep],
        })
        agg = (df.groupby(["d", "chunk_idx"], sort=False)["t"]
               .agg([("chunk_text", " ".join), ("n_tokens", "size")])
               .reset_index())
        ids = t[id_col].to_numpy(zero_copy_only=False)[agg["d"].to_numpy()]
        return pa.table({
            id_col: pa.array(ids),
            "chunk_idx": pa.array(agg["chunk_idx"].to_numpy().astype(np.int64)),
            "n_tokens": pa.array(agg["n_tokens"].to_numpy().astype(np.int64)),
            "chunk_text": pa.array(agg["chunk_text"].to_numpy(), pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def hashing_embed(ds, text_col: str, id_col: str, dim: int = 256,
                  lower: bool = True):
    """Feature-hashing text vectorizer (the classical hashing trick —
    Weinberger et al., ICML'09; sklearn's HashingVectorizer): token counts
    scattered into ``dim`` buckets by a stable 64-bit hash, sign-split to
    debias, L2-normalized. Gives every chunk/document a dense
    ``list<double>`` embedding with NO model or vocabulary — the
    deterministic stand-in for a neural embedder that makes the
    chunk → embed → ANN pipeline runnable end to end in this container.

    Vectorized: one Arrow split pass, one vectorized token hash, one
    np.add.at scatter per batch. Stateless → plain task pool.
    """
    from vertex_ray.stages.dedup_near import _hash_strings

    def fn(t: pa.Table) -> pa.Table:
        src = pc.utf8_lower(t[text_col]) if lower else t[text_col]
        lists = pc.split_pattern_regex(src, r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        off = lists.offsets.to_numpy().astype(np.int64)
        doc_of = np.repeat(np.arange(len(t)), np.diff(off))
        toks = flat.to_numpy(zero_copy_only=False)
        keep = toks != ""
        toks, doc_of = toks[keep], doc_of[keep]
        mat = np.zeros((len(t), dim), dtype=np.float64)
        if len(toks):
            h = _hash_strings(toks)
            bucket = (h % np.uint64(dim)).astype(np.int64)
            sign = np.where((h >> np.uint64(63)) & np.uint64(1), -1.0, 1.0)
            np.add.at(mat, (doc_of, bucket), sign)
        norms = np.linalg.norm(mat, axis=1)
        mat = mat / np.where(norms == 0, 1.0, norms)[:, None]
        return pa.table({
            id_col: t[id_col],
            "embedding": pa.array(list(mat)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# --- Gopher quality rules (Rae et al. 2021, arXiv:2112.11446 §A1.1) --------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules_op(text_col: str = "text", id_col: str = "doc_id"):
    """The Gopher / MassiveText document-quality rule set (Rae et al.
    2021, arXiv:2112.11446 Table A1) as one vectorized batch op. Emits
    the per-document feature values plus the composite keep flag:

    - ``n_words``          — whitespace tokens
    - ``mean_word_len``    — non-whitespace chars / n_words
    - ``symbol_ratio``     — (# '#' chars + '...'/'…' runs) / n_words
    - ``bullet_frac``      — lines starting with a bullet / n_lines
    - ``ellipsis_frac``    — lines ending with an ellipsis / n_lines
    - ``alpha_word_frac``  — words containing ≥1 [A-Za-z] / n_words
    - ``stop_hits``        — how many of the 8 Gopher stopwords occur
    - ``gopher_pass``      — 50 ≤ words ≤ 100k, 3 ≤ mean len ≤ 10,
      symbol < 0.1, bullets < 0.9, ellipsis < 0.3, alpha > 0.8,
      stop_hits ≥ 2 (int64 0/1)

    Every ratio is one double division of two exact integers, and every
    count is a non-overlapping regex count with the identical pattern in
    the SQL mirror (`SQL_GOPHER_DOCS`), so values hash bit-for-bit.
    Stateless — plain task-pool ``map_batches`` body; regexes are
    module-level (compiled once per worker import).
    """

    # re.ASCII everywhere: RE2 (the SQL-oracle engine) treats \b/\s/\S/\w
    # as ASCII classes; Python's default Unicode classes would diverge on
    # accented text
    word = re.compile(r"\S+", re.ASCII)
    ws = re.compile(r"\s", re.ASCII)
    ell = re.compile(r"\.\.\.|…")
    bullet = re.compile(r"(^|\n)[ \t]*[-*•]")
    ell_end = re.compile(r"(\.\.\.|…)(\n|$)")
    alpha_word = re.compile(r"\S*[A-Za-z]\S*", re.ASCII)
    stops = [re.compile(r"\b" + w_ + r"\b", re.ASCII)
             for w_ in GOPHER_STOPWORDS]

    def fn(t: pa.Table) -> pa.Table:
        s = pd.Series(t[text_col].to_numpy(zero_copy_only=False)).fillna("")
        low = s.str.lower()
        n_words = s.str.count(word).to_numpy(np.int64)
        n_nonws = (s.str.len() - s.str.count(ws)).to_numpy(np.int64)
        n_lines = (s.str.count(r"\n") + 1).to_numpy(np.int64)
        n_hash = s.str.count(r"#").to_numpy(np.int64)
        n_ell = s.str.count(ell).to_numpy(np.int64)
        n_bullet = s.str.count(bullet).to_numpy(np.int64)
        n_ell_end = s.str.count(ell_end).to_numpy(np.int64)
        n_alpha_w = s.str.count(alpha_word).to_numpy(np.int64)
        hits = np.zeros(len(s), dtype=np.int64)
        for p in stops:
            hits += (low.str.count(p) > 0).to_numpy(np.int64)
        w = n_words.astype(np.float64)
        safe_w = np.where(n_words > 0, w, 1.0)
        ln = n_lines.astype(np.float64)  # ≥ 1 always
        mean_word_len = np.where(n_words > 0, n_nonws / safe_w, 0.0)
        symbol_ratio = np.where(n_words > 0, (n_hash + n_ell) / safe_w, 0.0)
        bullet_frac = n_bullet / ln
        ellipsis_frac = n_ell_end / ln
        alpha_word_frac = np.where(n_words > 0, n_alpha_w / safe_w, 0.0)
        ok = ((n_words >= 50) & (n_words <= 100_000)
              & (mean_word_len >= 3.0) & (mean_word_len <= 10.0)
              & (symbol_ratio < 0.1) & (bullet_frac < 0.9)
              & (ellipsis_frac < 0.3) & (alpha_word_frac > 0.8)
              & (hits >= 2))
        return pa.table({
            id_col: t[id_col],
            "n_words": pa.array(n_words, type=pa.int64()),
            "mean_word_len": pa.array(mean_word_len, type=pa.float64()),
            "symbol_ratio": pa.array(symbol_ratio, type=pa.float64()),
            "bullet_frac": pa.array(bullet_frac, type=pa.float64()),
            "ellipsis_frac": pa.array(ellipsis_frac, type=pa.float64()),
            "alpha_word_frac": pa.array(alpha_word_frac, type=pa.float64()),
            "stop_hits": pa.array(hits, type=pa.int64()),
            "gopher_pass": pa.array(ok.astype(np.int64), type=pa.int64()),
        })

    return fn


def remove_boilerplate_lines(ds, text_col: str, id_col: str,
                             max_doc_freq: int, n_buckets: int = 64,
                             max_bad_lines: int = 1_000_000):
    """RefinedWeb / CCNet-style line-level boilerplate removal: any LINE
    that occurs in more than ``max_doc_freq`` distinct documents (nav
    bars, cookie banners, share footers) is dropped from EVERY document;
    the surviving lines are re-joined in their original order.

    Two passes over the corpus:

    1. line census — per batch, each document contributes its DISTINCT
       lines once (a document lives in exactly one row, so per-line
       partial doc-counts are additive across batches with no doc-level
       dedup exchange); one combiner-pattern hash exchange merges the
       int64 partials, and only lines ABOVE the threshold come back —
       the broadcast set is bounded by the true boilerplate count, not
       the corpus (capped at ``max_bad_lines``; a cap hit raises rather
       than silently under-filtering).
    2. rewrite — per batch, split, drop members of the broadcast
       64-bit-hash set (blake2b via ``dedup_near._hash_strings``), and
       re-join. The text column never enters an exchange.
    """
    from vertex_ray.stages.dedup_near import _hash_strings

    def census(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(t[text_col], "\n")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten().to_numpy(zero_copy_only=False)
        off = lists.offsets.to_numpy().astype(np.int64)
        doc_of = np.repeat(np.arange(len(t)), np.diff(off))
        h = _hash_strings(flat)
        # distinct (doc, line) pairs within the batch = distinct within
        # each doc, because a doc occupies exactly one row
        pair = pd.DataFrame({"d": doc_of, "h": h}).drop_duplicates()
        g = pair.groupby("h", sort=False).size().rename("__c").reset_index()
        g["__bucket"] = (g["h"].to_numpy()
                         % np.uint64(n_buckets)).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def over_threshold(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("h", sort=False)["__c"].sum().reset_index()
        return r[r["__c"] > max_doc_freq][["h"]]

    _badf = (ds.map_batches(census, batch_format="pyarrow")
             .groupby("__bucket")
             .map_groups(over_threshold, batch_format="pandas")
             .to_pandas())
    # a corpus with no boilerplate at all yields only empty groups, whose
    # concatenation can lose the column schema entirely
    bad = (_badf["h"].to_numpy() if "h" in _badf.columns
           else np.array([], dtype=np.uint64))
    if len(bad) > max_bad_lines:
        raise RuntimeError(
            f"boilerplate line set {len(bad)} exceeds max_bad_lines="
            f"{max_bad_lines}; raise the cap or the threshold")
    bad = np.sort(bad.astype(np.uint64))

    def rewrite(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(t[text_col], "\n")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten().to_numpy(zero_copy_only=False)
        off = lists.offsets.to_numpy().astype(np.int64)
        doc_of = np.repeat(np.arange(len(t)), np.diff(off))
        keep = ~np.isin(_hash_strings(flat), bad, assume_unique=False)
        joined = (pd.Series(flat[keep])
                  .groupby(doc_of[keep]).agg("\n".join))
        out = np.full(len(t), "", dtype=object)
        out[joined.index.to_numpy()] = joined.to_numpy()
        return pa.table({
            id_col: t[id_col],
            text_col: pa.array(out, type=pa.string()),
        })

    return ds.map_batches(rewrite, batch_format="pyarrow")


def readability_op(text_col: str = "text", id_col: str = "doc_id"):
    """Flesch reading-ease readability scoring (Flesch 1948; the public
    formula ``206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)``)
    with counting rules chosen to be regex-expressible on BOTH sides:

    - words      — ``\\S+`` runs,
    - sentences  — ``[.!?]+`` runs (min 1 so fragments count as one),
    - syllables  — vowel-group runs ``[aeiouyAEIOUY]+`` (the classic
      approximation; consonant-only words contribute 0).

    Every count is a non-overlapping regex count with the identical RE2
    pattern in the SQL mirror, and the score is the same fixed-order
    IEEE expression of exact-integer ratios, so values hash bit-for-bit.
    Stateless vectorized batch op."""
    word = re.compile(r"\S+", re.ASCII)
    sent = re.compile(r"[.!?]+")
    syl = re.compile(r"[aeiouyAEIOUY]+")

    def fn(t: pa.Table) -> pa.Table:
        s = pd.Series(t[text_col].to_numpy(zero_copy_only=False)).fillna("")
        n_words = s.str.count(word).to_numpy(np.int64)
        n_sent = np.maximum(s.str.count(sent).to_numpy(np.int64), 1)
        n_syl = s.str.count(syl).to_numpy(np.int64)
        w = np.where(n_words > 0, n_words.astype(np.float64), 1.0)
        score = np.where(
            n_words > 0,
            206.835 - 1.015 * (n_words / n_sent.astype(np.float64))
            - 84.6 * (n_syl / w),
            0.0)
        return pa.table({
            id_col: t[id_col],
            "n_words": pa.array(n_words, type=pa.int64()),
            "n_sentences": pa.array(n_sent, type=pa.int64()),
            "n_syllables": pa.array(n_syl, type=pa.int64()),
            "flesch": pa.array(score, type=pa.float64()),
        })

    return fn


def mixture_sample(ds, group_col: str, key_col: str,
                   weights: dict[str, float], default: float = 0.0):
    """Source-weighted corpus mixing — the data-mixing primitive of
    large-scale training pipelines (per-domain sampling rates à la
    The Pile / Gopher mixture tables): document ``d`` from source ``s``
    is kept iff the first 64 bits of ``md5(key)`` < weights[s]·2^64, so
    each source is downsampled to its target rate DETERMINISTICALLY
    (re-runs, retries and the SQL mirror pick the identical subset;
    sources absent from ``weights`` get ``default``). Embarrassingly
    parallel — a pure per-batch filter, no exchange; changing one
    source's weight only changes that source's kept set (hashes are
    per-document, not renormalized)."""
    import hashlib

    for s, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"mixture weight for {s!r} not in [0, 1]: {w}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default weight not in [0, 1]: {default}")

    def thresh(w: float) -> str:
        return format(min(int(w * (1 << 64)), (1 << 64) - 1), "016x")

    cuts = {s: thresh(w) for s, w in weights.items()}
    dflt = thresh(default)

    def keep(t: pa.Table) -> pa.Table:
        src = t[group_col].to_numpy(zero_copy_only=False)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        h = np.array([hashlib.md5(str(k).encode()).hexdigest()[:16]
                      for k in keys], dtype=object)
        lim = np.array([cuts.get(s, dflt) for s in src], dtype=object)
        return t.filter(pa.array(h < lim))

    return ds.map_batches(keep, batch_format="pyarrow")


def _doc_gram_buckets(t: pa.Table, text_col: str, id_col: str,
                      n_buckets: int, hash_family: str = "sip") -> tuple:
    """Per-batch hashed-gram buckets: (doc_row_index, bucket) for every
    unigram AND adjacent bigram occurrence (DSIR's feature space,
    arXiv:2302.03169 §3). ``hash_family``: "sip" (pandas siphash — the
    fast default at scale) or "md5" (``dedup_near._md5_hash64`` ==
    DuckDB ``md5_number_lower``, so a SQL engine can recompute every
    bucket — the audit family the oracled query uses). Returns
    (doc_of, buckets) numpy arrays in document-occurrence order."""
    from vertex_ray.stages.dedup_near import (
        _GRAM_MIX,
        _md5_hash64,
        _hash_strings,
    )

    lists = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), r"\s+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    off = lists.offsets.to_numpy().astype(np.int64)
    doc_of = np.repeat(np.arange(len(t)), np.diff(off))
    if hash_family == "md5":
        # audit family: grams are literal "<tok> <tok>" strings so DuckDB
        # md5_number_lower can recompute every bucket
        toks = flat.to_numpy(zero_copy_only=False)
        keep = toks != ""
        toks, doc_of = toks[keep], doc_of[keep]
        if len(toks) == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z
        same = (doc_of[:-1] == doc_of[1:]) if len(toks) >= 2 else np.zeros(
            0, dtype=bool)
        grams = [toks.astype(object)]
        gdoc = [doc_of]
        if same.any():
            grams.append(np.char.add(np.char.add(
                toks[:-1].astype(str), " "), toks[1:].astype(str))[same]
                .astype(object))
            gdoc.append(doc_of[:-1][same])
        allh = _md5_hash64(np.concatenate(grams))
        alld = np.concatenate(gdoc)
    else:
        # fast family: dictionary-encode the flattened tokens so the
        # (python-object) string materialization and the siphash both
        # touch only DISTINCT tokens — occurrence-level work is all
        # int32 code gathers. Same values as hashing every occurrence
        # (hash is per token value), ~3x on repetitive corpora.
        denc = flat.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False)
        dv = denc.dictionary
        empty = np.flatnonzero(
            pc.equal(dv, "").to_numpy(zero_copy_only=False))
        keep = (codes != empty[0]) if len(empty) else slice(None)
        codes, doc_of = codes[keep], doc_of[keep]
        if len(codes) == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z
        same = (doc_of[:-1] == doc_of[1:]) if len(codes) >= 2 else \
            np.zeros(0, dtype=bool)
        hd = _hash_strings(dv.to_numpy(zero_copy_only=False))
        th = hd[codes]
        # bigram hash combined arithmetically from the two token hashes
        # (dedup_near's gram-mix convention) — no gram strings are ever
        # materialized
        with np.errstate(over="ignore"):
            bg = (th[:-1] * _GRAM_MIX[0]) ^ (th[1:] * _GRAM_MIX[1])
        allh = np.concatenate([th, bg[same]])
        alld = np.concatenate([doc_of, doc_of[:-1][same]])
    order = np.argsort(alld, kind="stable")
    if n_buckets & (n_buckets - 1) == 0:
        # power-of-two bucket count: AND is the same value as % but
        # skips the uint64 division (the hottest single op at 12M grams)
        buckets = (allh[order] & np.uint64(n_buckets - 1)).astype(np.int64)
    else:
        buckets = (allh[order] % np.uint64(n_buckets)).astype(np.int64)
    return alld[order], buckets


def dsir_affinity(ds, text_col: str, id_col: str, *, target_col: str,
                  target_value, n_buckets: int = 1 << 14,
                  hash_family: str = "sip"):
    """DSIR-style data selection scoring (Xie et al., NeurIPS'23,
    arXiv:2302.03169): estimate how target-domain-like each document is
    from hashed n-gram (unigram + bigram) profiles.

    Pass 1 builds BOTH bucket-count profiles — the TARGET slice
    (``target_col == target_value``) and the full RAW corpus — in one
    scan: per-batch ``bincount`` combiners emit (bucket, raw, tgt) rows,
    merged by ONE tiny ``groupby(bucket)`` exchange; each profile is a
    dense int64 vector of ``n_buckets`` (independent of corpus size),
    broadcast once via ``ray.put``.
    Pass 2 scores every document batch locally (NO exchange): integer
    sufficient statistics

      ``n_grams``  — hashed-gram occurrences in the doc,
      ``t_hits``   — Σ over the doc's grams of the TARGET bucket count,
      ``r_hits``   — Σ over the doc's grams of the RAW bucket count,

    all exact int64 (hash-checkable against a SQL mirror), plus the DSIR
    importance log-ratio ``score = Σ_g ln((t[b_g]+1)/(T+B) · (R+B)/(r[b_g]+1))``
    — summed per document strictly left-to-right in occurrence order
    (``np.bincount`` weights), so it is bit-deterministic across runs and
    partitionings and equals a plain Python accumulation loop (floats
    stay out of the SQL oracle, which checks the integer statistics).

    Scale shape: ONE profile scan + one batch-local scoring pass;
    shuffle volume is bounded by ``n_buckets`` × batches; the broadcast
    is one ``n_buckets`` int64 vector per profile."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        doc_of, bk = _doc_gram_buckets(t, text_col, id_col, n_buckets,
                                       hash_family=hash_family)
        is_tgt = np.asarray(
            pc.equal(t[target_col], target_value).to_numpy(
                zero_copy_only=False), dtype=bool)
        raw = np.bincount(bk, minlength=n_buckets).astype(np.int64)
        tgt = np.bincount(bk[is_tgt[doc_of]],
                          minlength=n_buckets).astype(np.int64)
        nz = np.flatnonzero(raw)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "raw": pa.array(raw[nz]),
                         "tgt": pa.array(tgt[nz])})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").sum(["raw", "tgt"]).take_all())
    tprof = np.zeros(n_buckets, dtype=np.int64)
    rprof = np.zeros(n_buckets, dtype=np.int64)
    for r in rows:
        rprof[r["bucket"]] = r["sum(raw)"]
        tprof[r["bucket"]] = r["sum(tgt)"]
    T, R, B = int(tprof.sum()), int(rprof.sum()), n_buckets
    logw = (np.log((tprof + 1.0) / (T + B)) - np.log((rprof + 1.0) / (R + B)))
    tref, rref, wref = ray.put(tprof), ray.put(rprof), ray.put(logw)

    def score(t: pa.Table) -> pa.Table:
        tp, rp, w = ray.get(tref), ray.get(rref), ray.get(wref)
        doc_of, bk = _doc_gram_buckets(t, text_col, id_col, n_buckets,
                                       hash_family=hash_family)
        n = len(t)
        n_grams = np.bincount(doc_of, minlength=n).astype(np.int64)
        t_hits = np.zeros(n, dtype=np.int64)
        r_hits = np.zeros(n, dtype=np.int64)
        sc = np.zeros(n, dtype=np.float64)
        if len(bk):
            # doc_of is sorted (occurrence order): int64 segment sums are
            # exact under any order; the FLOAT score uses bincount's
            # strictly sequential accumulation in occurrence order — a
            # specifiable contract (equals a plain left-to-right loop)
            nz = n_grams > 0
            off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(n_grams, out=off[1:])
            starts = off[:-1][nz]
            t_hits[nz] = np.add.reduceat(tp[bk], starts)
            r_hits[nz] = np.add.reduceat(rp[bk], starts)
            sc = np.bincount(doc_of, weights=w[bk], minlength=n)
        return pa.table({
            id_col: t[id_col],
            "n_grams": pa.array(n_grams),
            "t_hits": pa.array(t_hits),
            "r_hits": pa.array(r_hits),
            "dsir_score": pa.array(sc),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def _doc_lm_buckets(t: pa.Table, text_col: str, n_buckets: int,
                    hash_family: str = "sip") -> tuple:
    """Per-batch ALIGNED unigram/bigram buckets for the bigram LM:
    returns ``(doc_of, uni_bk, bdoc, prev_bk, big_bk)`` — one row per
    token occurrence (document order) and one row per adjacent
    same-document token pair, where ``prev_bk`` is the LEFT token's
    unigram bucket (the conditional's context) and ``big_bk`` the pair's
    bucket. Tokenization and both hash families match
    ``_doc_gram_buckets`` exactly (md5 = DuckDB ``md5_number_lower`` so
    a SQL engine can recompute every bucket; sip = the fast
    dictionary-encoded family for scale)."""
    from vertex_ray.stages.dedup_near import (
        _GRAM_MIX,
        _hash_strings,
        _md5_hash64,
    )

    lists = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), r"\s+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    off = lists.offsets.to_numpy().astype(np.int64)
    doc_of = np.repeat(np.arange(len(t)), np.diff(off))
    z = np.zeros(0, dtype=np.int64)
    if hash_family == "md5":
        toks = flat.to_numpy(zero_copy_only=False)
        keep = toks != ""
        toks, doc_of = toks[keep], doc_of[keep]
        if len(toks) == 0:
            return z, z, z, z, z
        th = _md5_hash64(toks.astype(object))
        same = (doc_of[:-1] == doc_of[1:]) if len(toks) >= 2 else \
            np.zeros(0, dtype=bool)
        if same.any():
            grams = np.char.add(np.char.add(
                toks[:-1].astype(str), " "), toks[1:].astype(str))[same] \
                .astype(object)
            bh = _md5_hash64(grams)
        else:
            bh = np.zeros(0, dtype=np.uint64)
        bdoc = doc_of[:-1][same]
        prev_h = th[:-1][same]
    else:
        denc = flat.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False)
        dv = denc.dictionary
        empty = np.flatnonzero(
            pc.equal(dv, "").to_numpy(zero_copy_only=False))
        keep = (codes != empty[0]) if len(empty) else slice(None)
        codes, doc_of = codes[keep], doc_of[keep]
        if len(codes) == 0:
            return z, z, z, z, z
        hd = _hash_strings(dv.to_numpy(zero_copy_only=False))
        th = hd[codes]
        same = (doc_of[:-1] == doc_of[1:]) if len(codes) >= 2 else \
            np.zeros(0, dtype=bool)
        with np.errstate(over="ignore"):
            bh = ((th[:-1] * _GRAM_MIX[0]) ^ (th[1:] * _GRAM_MIX[1]))[same]
        bdoc = doc_of[:-1][same]
        prev_h = th[:-1][same]

    if n_buckets & (n_buckets - 1) == 0:
        mask = np.uint64(n_buckets - 1)

        def bk(h):
            return (h & mask).astype(np.int64)
    else:
        m = np.uint64(n_buckets)

        def bk(h):
            return (h % m).astype(np.int64)

    return doc_of, bk(th), bdoc, bk(prev_h), bk(bh)


def bigram_lm_perplexity(ds, text_col: str, id_col: str, *,
                         train_col: str | None = None,
                         train_value=None, n_buckets: int = 1 << 14,
                         hash_family: str = "sip"):
    """CCNet-style language-model perplexity quality scoring (Wenzek et
    al., LREC 2020, arXiv:1911.00359 §3.3): score every document by its
    perplexity under an n-gram LM trained on a reference slice — low
    perplexity ≈ fluent/clean text, high perplexity ≈ gibberish,
    boilerplate, OCR noise. CCNet uses a KenLM 5-gram model trained on
    Wikipedia; this engine's columnar analogue is an add-one-smoothed
    BIGRAM model over hashed token buckets (the DSIR feature space),
    trained on the ``train_col == train_value`` slice (or the whole
    corpus when ``train_col`` is None — self-perplexity, the outlier
    flag):

      ``P(w_i | w_{i-1}) = (C2[b(w_{i-1} w_i)] + 1) / (C1[b(w_{i-1})] + B)``
      ``cross_entropy = -(1/n_bigrams) Σ_i ln P(w_i | w_{i-1})``
      ``perplexity = exp(cross_entropy)``

    Scale shape (same as ``dsir_affinity``): pass 1 builds both count
    profiles with per-batch ``bincount`` combiners and ONE tiny
    ``groupby(bucket)`` exchange (≤ ``n_buckets`` rows per batch, output
    two dense int64 vectors independent of corpus size, broadcast once
    via ``ray.put``); pass 2 scores every batch locally with NO
    exchange. Integer sufficient statistics — ``n_tokens``,
    ``n_bigrams``, ``uni_hits`` (Σ context-bucket train counts),
    ``big_hits`` (Σ bigram-bucket train counts) — are exact int64 and
    SQL-recomputable under the md5 family; the float ``logprob_sum`` is
    summed per document strictly in occurrence order (``np.bincount``
    weights — equals a left-to-right Python loop bit-for-bit), so
    ``cross_entropy``/``perplexity`` are bit-deterministic across runs
    and partitionings. Documents with no bigram (<2 tokens) get NaN
    perplexity (CCNet leaves them unscored).

    The reference has no corpus scorer; its closest shape is the
    two-phase aggregate-state pattern of metricalize
    (/root/reference src/transforms/metricalize.rs:220-283) — global
    state built once, then applied per batch."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        doc_of, uni, bdoc, prev, big = _doc_lm_buckets(
            t, text_col, n_buckets, hash_family=hash_family)
        if train_col is not None:
            tr = np.asarray(pc.equal(t[train_col], train_value)
                            .to_numpy(zero_copy_only=False), dtype=bool)
            uni = uni[tr[doc_of]]
            big = big[tr[bdoc]]
        u = np.bincount(uni, minlength=n_buckets).astype(np.int64)
        b = np.bincount(big, minlength=n_buckets).astype(np.int64)
        nz = np.flatnonzero(u + b)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "uni": pa.array(u[nz]),
                         "big": pa.array(b[nz])})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").sum(["uni", "big"]).take_all())
    uprof = np.zeros(n_buckets, dtype=np.int64)
    bprof = np.zeros(n_buckets, dtype=np.int64)
    for r in rows:
        uprof[r["bucket"]] = r["sum(uni)"]
        bprof[r["bucket"]] = r["sum(big)"]
    uref, bref = ray.put(uprof), ray.put(bprof)
    B = float(n_buckets)

    def score(t: pa.Table) -> pa.Table:
        up, bp = ray.get(uref), ray.get(bref)
        doc_of, _uni, bdoc, prev, big = _doc_lm_buckets(
            t, text_col, n_buckets, hash_family=hash_family)
        n = len(t)
        n_tokens = np.bincount(doc_of, minlength=n).astype(np.int64)
        n_bigrams = np.bincount(bdoc, minlength=n).astype(np.int64)
        uni_hits = np.zeros(n, dtype=np.int64)
        big_hits = np.zeros(n, dtype=np.int64)
        lsum = np.zeros(n, dtype=np.float64)
        if len(bdoc):
            # bdoc is sorted (document-occurrence order): int64 segment
            # sums are order-free; the float log-prob sum uses
            # bincount's strictly sequential in-order accumulation
            nz = n_bigrams > 0
            off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(n_bigrams, out=off[1:])
            starts = off[:-1][nz]
            uni_hits[nz] = np.add.reduceat(up[prev], starts)
            big_hits[nz] = np.add.reduceat(bp[big], starts)
            logp = np.log((bp[big] + 1.0) / (up[prev] + B))
            lsum = np.bincount(bdoc, weights=logp, minlength=n)
        with np.errstate(invalid="ignore", divide="ignore"):
            ce = np.where(n_bigrams > 0,
                          -lsum / np.maximum(n_bigrams, 1), np.nan)
            ppl = np.exp(ce)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(n_tokens),
            "n_bigrams": pa.array(n_bigrams),
            "uni_hits": pa.array(uni_hits),
            "big_hits": pa.array(big_hits),
            "logprob_sum": pa.array(lsum),
            "cross_entropy": pa.array(ce),
            "perplexity": pa.array(ppl),
        })

    return ds.map_batches(score, batch_format="pyarrow")


# PII scrub patterns, applied IN ORDER (each regex sees the text with all
# earlier categories already masked — so counts are well-defined and the
# SQL mirror can recompute them with the same nesting). RE2-only syntax
# (no lookaround/backrefs) so pyarrow (RE2) and the DuckDB oracle (RE2)
# match byte-for-byte. Ordering: emails first (their local parts contain
# digits), SSN before phone (3-2-4 vs 3-3-4 never collide, but masking
# early keeps later patterns from seeing partial digit runs), IPs before
# phones (dotted quads vs dotted 3-3-4).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("cc", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CC>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def pii_redact_op(text_col: str = "text", id_col: str = "doc_id"):
    """PII redaction over a document column — the training-data scrub
    pass (emails, SSNs, credit cards, IPv4s, phone numbers → typed mask
    tokens), plus exact per-category match counts. The reference ships
    the single-value ``redact`` VTL function
    (lib/vtl/src/compiler/function/redact.rs); this is the corpus-scale
    columnar form: every pattern is ONE vectorized RE2 pass
    (``count_substring_regex`` + ``replace_substring_regex``) over the
    whole batch — no per-row Python. Counts are non-overlapping
    leftmost matches, identical to DuckDB ``len(regexp_extract_all)``,
    so the whole op is hash-checkable against a SQL mirror."""

    def fn(t: pa.Table) -> pa.Table:
        cur = t[text_col]
        if isinstance(cur, pa.ChunkedArray):
            cur = cur.combine_chunks()
        cols: dict = {id_col: t[id_col]}
        total = np.zeros(len(t), dtype=np.int64)
        for name, pat, mask in PII_PATTERNS:
            c = pc.count_substring_regex(cur, pat)
            cn = c.to_numpy(zero_copy_only=False).astype(np.int64)
            cols[f"n_{name}"] = pa.array(cn, type=pa.int64())
            total += cn
            cur = pc.replace_substring_regex(cur, pat, mask)
        cols["n_pii"] = pa.array(total, type=pa.int64())
        cols["redacted"] = cur
        return pa.table(cols)

    return fn


URL_RE = r'https?://[^\s"<>]+'
DOMAIN_RE = r'https?://(?P<domain>[^\s"<>/:]+)'


def url_domain_op(text_col: str = "text", id_col: str = "doc_id"):
    """URL / domain extraction over a document column — the first step
    of domain-level corpus curation (per-domain mixture weights,
    domain blocklists à la RefinedWeb/C4). Per doc: ``n_urls`` =
    non-overlapping URL matches, ``domain`` = host of the FIRST URL
    (null when the doc has none). Both are single vectorized RE2 passes
    (``count_substring_regex`` / ``extract_regex``), and DuckDB's
    regexp functions run the same RE2 syntax, so the whole op is
    hash-checkable against a SQL mirror (``len(regexp_extract_all)`` +
    ``nullif(regexp_extract(..., 1), '')``)."""

    def fn(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        n = pc.cast(pc.count_substring_regex(txt, URL_RE), pa.int64())
        dom = pc.struct_field(pc.extract_regex(txt, DOMAIN_RE), "domain")
        return pa.table({id_col: t[id_col], "n_urls": n, "domain": dom})

    return fn


def domain_freq(ds, text_col: str = "text", id_col: str = "doc_id",
                blocked: frozenset | None = None):
    """Corpus-level domain frequency table: (domain, n_docs, n_urls),
    docs bucketed by the host of their first URL; URL-less docs and
    ``blocked`` domains dropped. The blocklist is a broadcast set
    applied batch-locally BEFORE the exchange; shuffle volume is the
    per-batch distinct-domain count (combiner pattern via group_sum),
    never the corpus."""
    from vertex_ray.stages.promql import group_sum

    blocked_arr = pa.array(sorted(blocked), type=pa.string()) \
        if blocked else None
    ex = url_domain_op(text_col, id_col)

    def prep(t: pa.Table) -> pa.Table:
        d = ex(t)
        d = d.filter(pc.is_valid(d["domain"]))
        if blocked_arr is not None and len(blocked_arr):
            d = d.filter(pc.invert(pc.is_in(d["domain"],
                                            value_set=blocked_arr)))
        return pa.table({"domain": d["domain"],
                         "n_docs": pa.array(np.ones(len(d), np.int64)),
                         "n_urls": d["n_urls"]})

    return group_sum(ds.map_batches(prep, batch_format="pyarrow"),
                     ["domain"], ["n_docs", "n_urls"])


def length_fit_residuals(ds, *, text_col: str = "text",
                         id_col: str = "doc_id", y_col: str = "n_chars",
                         k_sigma: float = 3.0,
                         group_col: str | None = None):
    """Distributed EXACT least squares over the corpus + residual
    outlier flags — the "quality calibration" curation pass: fit the
    global chars-per-token line (natural text is tightly linear in
    whitespace tokens) and flag documents whose residual exceeds
    ``k_sigma`` global standard deviations — code dumps, tables and
    degenerate generations sit far off the line.

    Scale shape (the canonical two-pass broadcast pattern):

    1. pass 1 — each batch reduces itself to SIX integer sufficient
       statistics ``(n, Σx, Σy, Σxy, Σx², Σy²)`` (exact int64 within a
       batch); one tiny collect (one row per batch) and a Python
       arbitrary-precision total on the driver, so the global sums are
       EXACT at any corpus size (DuckDB's mirror sums to HUGEINT — also
       exact);
    2. the closed-form slope / intercept / residual variance are each
       ONE fixed-order float expression over those exact integers
       (``b = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²)``;
       ``s² = (Vy − C²/Vx)/n²`` from the integer moment numerators), so
       engine and SQL mirror produce bit-identical doubles;
    3. pass 2 — a stateless per-batch map appends
       ``residual = y − (a + b·x)`` and ``outlier = |residual| > k·s``;
       the fit scalars ride the closure (broadcast once, never
       per-batch state).

    ``group_col`` fits a SEPARATE line per group (per language / per
    source — chars-per-token differs across languages): the partial
    batches carry one row per (group, batch), the driver total is one
    bignum accumulator per group (bounded by group cardinality, never
    data volume), and pass 2 looks each row's scalars up from the
    broadcast per-group fit table.

    The reference has no regression anywhere — this is the engine-side
    analogue of the scoring passes large-corpus pipelines run between
    vertex-style transport steps (same two-pass shape as
    unigram_freq_score)."""
    import math

    stats = ["n", "sx", "sy", "sxy", "sxx", "syy"]

    def partial(t: pa.Table) -> pa.Table:
        x = token_count(t[text_col].to_numpy(zero_copy_only=False))
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        xi = x.astype(np.int64)
        df = pd.DataFrame({
            "__g": (t[group_col].to_numpy(zero_copy_only=False)
                    if group_col else np.zeros(len(xi), dtype=np.int64)),
            "n": np.ones(len(xi), dtype=np.int64),
            "sx": xi, "sy": y, "sxy": xi * y, "sxx": xi * xi,
            "syy": y * y,
        })
        g = df.groupby("__g", sort=False)[stats].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc: dict = {}
    for r in parts:
        a6 = acc.setdefault(r["__g"], [0, 0, 0, 0, 0, 0])
        for i, k in enumerate(stats):
            a6[i] += int(r[k])  # Python bignum — overflow-free

    def fit(a6):
        n, sx, sy, sxy, sxx, syy = a6
        # exact integer moment numerators (bignum)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        c = n * sxy - sx * sy
        # fixed-order float expressions — the SQL mirror runs the
        # same text
        b = float(c) / float(vx)
        a = (float(sy) - b * float(sx)) / float(n)
        s2 = (float(vy) - float(c) * float(c) / float(vx)) \
            / (float(n) * float(n))
        return a, b, math.sqrt(s2)

    if not acc:
        raise ValueError("length_fit_residuals on an empty dataset")
    fits = {g: fit(a6) for g, a6 in acc.items()}

    def flag(t: pa.Table) -> pa.Table:
        x = token_count(t[text_col].to_numpy(zero_copy_only=False))
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        xf = x.astype(np.float64)
        if group_col:
            gs = t[group_col].to_numpy(zero_copy_only=False)
            a = np.array([fits[g][0] for g in gs])
            b = np.array([fits[g][1] for g in gs])
            s = np.array([fits[g][2] for g in gs])
        else:
            a, b, s = fits[0]
        resid = y - (a + b * xf)
        cols = {id_col: t[id_col]}
        if group_col:
            cols[group_col] = t[group_col]
        cols["n_tokens"] = pa.array(x.astype(np.int64))
        cols[y_col] = t[y_col]
        cols["residual"] = pa.array(resid)
        cols["outlier"] = pa.array(np.abs(resid) > k_sigma * s)
        return pa.table(cols)

    return ds.map_batches(flag, batch_format="pyarrow")


def adjacent_pair_counts(ds, text_col: str, k: int = 100):
    """Corpus-wide adjacent-token-pair frequencies with an exact global
    top-k — the distributed core of BPE tokenizer training (each merge
    step of Sennrich et al.'s algorithm is exactly "find the most
    frequent adjacent pair"; arXiv:1508.07909). Whitespace tokens,
    pairs within a document only (never across documents).

    Scale shape (combiner pattern, same as token_counts): each batch
    explodes to its own (a, b) pair counts with one vectorized split +
    boundary mask + value_counts — the ONE ``groupby(pair)`` exchange
    carries per-batch DISTINCT pairs, bounded by pair vocabulary, never
    corpus length; int64 partial counts merge exactly. The final global
    top-k is a Dataset sort + limit over pair-vocabulary rows with a
    deterministic tie order (cnt desc, a asc, b asc) — identical to the
    SQL mirror's ORDER BY."""

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(t[text_col])
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        n = len(flat)
        if n < 2:
            return pa.table({"a": pa.array([], type=pa.string()),
                             "b": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        # mask out the last token of each document (no cross-doc pair)
        ends = np.cumsum(lens) - 1  # flat index of each doc's last token
        keep = np.ones(n - 1, dtype=bool)
        keep[ends[ends < n - 1]] = False
        a = flat[:-1][keep]
        b = flat[1:][keep]
        df = pd.DataFrame({"a": a, "b": b})
        g = df.groupby(["a", "b"], sort=False).size().rename("cnt") \
            .reset_index()
        g = g[(g["a"] != "") & (g["b"] != "")]
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["a", "b"])
        .sum("cnt")
        .map_batches(lambda t: t.rename_columns(["a", "b", "cnt"]),
                     batch_format="pyarrow")
    )
    return counts.sort(["cnt", "a", "b"],
                       descending=[True, False, False]).limit(k)


def _bpe_merge_word(syms: tuple, a: str, b: str, ab: str) -> tuple:
    """One greedy left-to-right pass merging adjacent (a, b) → ab.

    A single pass is exact: the formed token ``a+b`` can never equal
    ``a`` (``b`` is non-empty), so a merge can never cascade into a new
    ``(a, b)`` occurrence within the same pass."""
    ns, i = [], 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            ns.append(ab)
            i += 2
        else:
            ns.append(syms[i])
            i += 1
    return tuple(ns)


def bpe_train(ds, text_col: str, n_merges: int = 100,
              max_vocab: int = 1 << 18):
    """Byte-pair-encoding tokenizer TRAINING over the corpus (Sennrich
    et al., arXiv:1508.07909 — the standard subword-nmt shape):

    1. ONE distributed pass reduces the corpus to the word-frequency
       vocabulary, TOP-``max_vocab`` bounded (:func:`vocab_topk` —
       combiner exchange bounded by vocabulary size, deterministic
       cnt-desc/token-asc truncation order, LOGGED when it bites). This
       is the only stage that touches raw text, and driver state is
       bounded by ``max_vocab`` — never corpus length, never the
       unbounded web-scale distinct-word tail.
    2. The merge loop runs on the bounded vocab INCREMENTALLY: pair
       counts are maintained under each merge (subtract the rewritten
       word's old pairs, add its new ones), and a pair→word-ids index
       means each merge touches only the words containing the merged
       pair — the subword-nmt shape, not a full vocab rescan per merge.
       Deterministic tie order (count desc, then lexicographic pair) →
       the same corpus always yields the same merge table, on any
       cluster shape.

    Words are split to characters with a ``</w>`` end-of-word marker.
    Returns ``(merges, vocab_size)`` where ``merges`` is an ordered
    list of (a, b) symbol pairs — feed to :class:`BpeApply`."""
    import logging
    from collections import Counter, defaultdict

    vocab_rows = vocab_topk(ds, text_col, max_vocab).take_all()
    if len(vocab_rows) >= max_vocab:
        logging.getLogger(__name__).warning(
            "bpe_train: vocabulary truncated to the top %d words "
            "(cnt desc, token asc) — merge statistics ignore the "
            "rarest-word tail", max_vocab)
    # symbol-tuple representation of each distinct word
    words = [[tuple(r["token"]) + ("</w>",), int(r["cnt"])]
             for r in vocab_rows]

    pairs: Counter = Counter()
    where: defaultdict = defaultdict(set)  # pair -> indices into words
    for wi, (syms, freq) in enumerate(words):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pairs[p] += freq
            where[p].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pairs:
            break
        # deterministic: highest count, then lexicographically smallest
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for wi in list(where.get(best, ())):
            syms, freq = words[wi]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] -= freq
                if pairs[p] <= 0:
                    del pairs[p]
                where[p].discard(wi)
            ns = _bpe_merge_word(syms, a, b, ab)
            words[wi][0] = ns
            for i in range(len(ns) - 1):
                p = (ns[i], ns[i + 1])
                pairs[p] += freq
                where[p].add(wi)
    vocab = {s for syms, _ in words for s in syms}
    return merges, len(vocab)


class BpeApply:
    """Actor-pool subword encoder: the broadcast merge table is compiled
    to ranks ONCE per actor (``__init__``), and per-word encodings are
    memoized in actor state across batches — the canonical stateful
    map_batches stage (geoip pattern, SURVEY §2.1 #10). Appends
    ``n_subwords`` and the space-joined ``subwords`` encoding."""

    def __init__(self, merges: list[tuple[str, str]],
                 text_col: str = "text", id_col: str = "doc_id",
                 strategy: str = "rank"):
        self.rank = {pair: i for i, pair in enumerate(merges)}
        self.merges = list(merges)
        self.strategy = strategy
        self.cache: dict = {}
        self.text_col = text_col
        self.id_col = id_col

    def _encode_word(self, w: str) -> list:
        hit = self.cache.get(w)
        if hit is not None:
            return hit
        syms = list(w) + ["</w>"]
        if self.strategy == "sequential":
            # Replay the learned merge table in rank order, one greedy
            # left-to-right pass per merge — exactly the training-time
            # transform (bpe_train's own rewrite), hence SQL-mirrorable
            # stage by stage. Differs from rank-priority encoding only
            # when a later merge re-forms a token an earlier merge
            # consumes (same string from two decompositions) — a case
            # tests/test_text_ops.py pins as absent on the corpus.
            from vertex_ray.stages.text import _bpe_merge_word
            t = tuple(syms)
            for a, b in self.merges:
                if len(t) < 2:
                    break
                t = _bpe_merge_word(t, a, b, a + b)
            syms = list(t)
            self.cache[w] = syms
            return syms
        while len(syms) > 1:
            ranked = [(self.rank.get((syms[i], syms[i + 1])), i)
                      for i in range(len(syms) - 1)]
            ranked = [(r, i) for r, i in ranked if r is not None]
            if not ranked:
                break
            _, i = min(ranked)
            syms[i:i + 2] = [syms[i] + syms[i + 1]]
        self.cache[w] = syms
        return syms

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_numpy(zero_copy_only=False)
        n_sub = np.empty(len(texts), dtype=np.int64)
        joined = []
        for j, txt in enumerate(texts):
            subs: list = []
            for w in (txt or "").split():
                subs.extend(self._encode_word(w))
            n_sub[j] = len(subs)
            joined.append(" ".join(subs))
        return pa.table({
            self.id_col: t[self.id_col],
            "n_subwords": pa.array(n_sub),
            "subwords": pa.array(joined, type=pa.string()),
        })


def compression_ratio_op(text_col: str = "text", id_col: str = "doc_id",
                         max_ratio: float = 0.98, min_ratio: float = 0.25,
                         level: int = 6):
    """Compression-ratio quality signal: ``len(zlib(text)) / len(text)``
    per document (C-speed per doc, deterministic for a fixed zlib
    level). Highly repetitive boilerplate compresses far below normal
    prose (low ratio); random/binary junk doesn't compress (ratio near
    or above 1). ``keep`` flags documents inside [min_ratio, max_ratio]
    — the two-sided filter corpus pipelines use for both failure modes.
    Deterministic and library-stable in this container; checked by
    bounds/monotonicity property tests (no SQL mirror — zlib is not
    SQL-recomputable), rows-only in the driver gate."""
    import zlib

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_numpy(zero_copy_only=False)
        raw = [(s or "").encode("utf-8") for s in texts]
        n_bytes = np.fromiter((len(b) for b in raw), dtype=np.int64,
                              count=len(raw))
        n_comp = np.fromiter(
            (len(zlib.compress(b, level)) for b in raw), dtype=np.int64,
            count=len(raw))
        ratio = np.where(n_bytes > 0, n_comp / np.maximum(n_bytes, 1),
                         np.inf)
        keep = (ratio >= min_ratio) & (ratio <= max_ratio)
        return pa.table({
            id_col: t[id_col],
            "n_bytes": pa.array(n_bytes),
            "n_compressed": pa.array(n_comp),
            "compression_ratio": pa.array(ratio, type=pa.float64()),
            "keep": pa.array(keep),
        })

    return fn


def hashing_embed_int(ds, text_col: str, id_col: str, dim: int = 128,
                      lower: bool = True):
    """INTEGER hashing-trick vectorizer — the oracle-able twin of
    :func:`hashing_embed` (whose sip-family hash and float L2
    normalization are unhashable): token buckets and signs come from the
    md5 family (``md5_number_lower`` parity with DuckDB), counts stay
    int64 and UNnormalized, so every coordinate — and every downstream
    integer dot product — is exactly SQL-recomputable. Same vectorized
    shape: one Arrow split pass, one hash, one np.add.at scatter."""
    from vertex_ray.stages.dedup_near import _md5_hash64

    def fn(t: pa.Table) -> pa.Table:
        src = pc.utf8_lower(t[text_col]) if lower else t[text_col]
        lists = pc.split_pattern_regex(src, r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        off = lists.offsets.to_numpy().astype(np.int64)
        doc_of = np.repeat(np.arange(len(t)), np.diff(off))
        toks = flat.to_numpy(zero_copy_only=False)
        keep = toks != ""
        toks, doc_of = toks[keep], doc_of[keep]
        mat = np.zeros((len(t), dim), dtype=np.int64)
        if len(toks):
            h = _md5_hash64(toks)
            bucket = (h % np.uint64(dim)).astype(np.int64)
            sign = np.where((h >> np.uint64(63)) & np.uint64(1), -1, 1)
            np.add.at(mat, (doc_of, bucket), sign)
        return pa.table({
            id_col: t[id_col],
            "embedding": pa.array(list(mat)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
