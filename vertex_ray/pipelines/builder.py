"""Config → Dataset pipeline builder — the analogue of vertex's YAML
topology (lib/framework/src/config/mod.rs:208-215 component graph +
topology/builder.rs build_pieces, and `vertex validate`, src/validate.rs).

A pipeline config is a dict (load it from YAML/JSON yourself):

    {
      "sources": {
        "events": {"type": "parquet", "path": ".../events.parquet",
                    "columns": ["ts", "value"]},
        "logs":   {"type": "jsonl", "path": ".../logs.jsonl"},
      },
      "transforms": {
        "big":   {"type": "filter", "inputs": ["events"],
                   "where": ["value", ">", 100]},
        "tagged": {"type": "relabel", "inputs": ["big"],
                    "ops": [["set", "tier", "hot"]]},
      },
      "sinks": {
        "out": {"type": "parquet", "inputs": ["tagged"], "path": "/tmp/out"},
      },
    }

Same contract as the reference: components are named, wired by `inputs`
lists, and the graph must be acyclic with every input defined
(`validate()` is the dry-build, like `vertex validate`). Multiple inputs
union; a transform producing multiple ports (route) exposes them as
`name.port`.

Every step maps to the library's vectorized stages — the builder adds no
execution machinery of its own; it only assembles `ray.data.Dataset`
chains, exactly as the SURVEY §2.7 extension surface promises. Custom
steps register via ``STEP_TYPES``.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow.compute as pc

_OPS = {
    ">": pc.greater,
    ">=": pc.greater_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    "==": pc.equal,
    "!=": pc.not_equal,
}


def _predicate(spec):
    """["col", op, literal] → batch predicate; a STRING compiles through
    the text expression language (functions/exprlang — the VTL-condition
    analogue, e.g. ``"value > 50 && contains(event_type, 'err')"``); a
    callable passes through."""
    if callable(spec):
        return spec
    if isinstance(spec, str):
        from vertex_ray.functions.exprlang import compile_predicate

        return compile_predicate(spec)
    col, op, lit = spec
    return lambda t: _OPS[op](t[col], lit)


# --- source builders --------------------------------------------------------


def _src_parquet(cfg):
    import ray.data as rd

    kwargs = {}
    if cfg.get("columns"):
        kwargs["columns"] = list(cfg["columns"])
    return rd.read_parquet(cfg["path"], **kwargs)


def _src_text_codec(decoder_name):
    def build(cfg):
        import functools

        import ray.data as rd

        from vertex_ray.sources import codecs

        decode = getattr(codecs, decoder_name)
        return rd.read_text(cfg["path"]).map_batches(
            functools.partial(decode, **cfg.get("options", {})),
            batch_format="pyarrow",
        )

    return build


# --- transform builders (each returns Dataset -> Dataset) -------------------


def _t_filter(cfg, ds):
    from vertex_ray.stages.ops import filter_op

    return ds.map_batches(filter_op(_predicate(cfg["where"])), batch_format="pyarrow")


def _t_sample(cfg, ds):
    from vertex_ray.stages.ops import sample_op

    return ds.map_batches(
        sample_op(cfg["rate"], cfg.get("key_field"), cfg.get("method", "hash")),
        batch_format="pyarrow",
    )


def _t_relabel(cfg, ds):
    from vertex_ray.stages.ops import relabel_ops

    return ds.map_batches(
        relabel_ops([tuple(op) for op in cfg["ops"]]), batch_format="pyarrow"
    )


def _t_dedup(cfg, ds):
    from vertex_ray.stages.dedup import dedup_exact

    return dedup_exact(ds, cfg["key_cols"], cfg["order_col"])


def _t_throttle(cfg, ds):
    from vertex_ray.stages.ops import throttle_quota

    return throttle_quota(
        ds, cfg["key_col"], cfg["ts_col"], cfg["window_seconds"],
        cfg["threshold"], cfg["tie_col"],
    )


def _t_throttle_gcra(cfg, ds):
    from vertex_ray.stages.ops import throttle_gcra

    out = throttle_gcra(
        ds, cfg["key_col"], cfg["ts_col"], cfg["window_seconds"],
        cfg["threshold"], cfg["tie_col"],
    )
    if cfg.get("drop", True):  # the reference drops non-conforming events
        import pyarrow.compute as _pc

        out = out.map_batches(
            lambda t: t.filter(_pc.equal(t["allowed"], True)).drop_columns(
                ["allowed"]),
            batch_format="pyarrow")
    return out


def _t_metricalize(cfg, ds):
    from vertex_ray.stages.metricalize import metricalize

    return metricalize(
        ds, cfg["tag_cols"], cfg["value_col"], cfg["ts_col"],
        cfg.get("window_seconds", 60), cfg.get("uppers"),
        cfg.get("increment_by_value", True), cfg.get("order_col"),
    )


def _t_summarize(cfg, ds):
    from vertex_ray.stages.metricalize import summarize

    return summarize(
        ds, cfg["tag_cols"], cfg["value_col"], cfg["ts_col"],
        cfg.get("window_seconds", 60),
        tuple(cfg.get("quantiles", (0.5, 0.9, 0.99))),
    )


def _t_text_op(op_factory_name):
    def build(cfg, ds):
        from vertex_ray.stages import text

        factory = getattr(text, op_factory_name)
        return ds.map_batches(
            factory(cfg.get("text_col", "text")), batch_format="pyarrow"
        )

    return build


def _t_spans(cfg, ds):
    from vertex_ray.stages.trace import spans_from_transcripts

    return spans_from_transcripts(ds, cfg.get("n_buckets", 32))


def _t_trace_assemble(cfg, ds):
    from vertex_ray.stages.trace import trace_assemble

    return trace_assemble(ds, cfg.get("n_buckets", 32))


def _t_service_graph(cfg, ds):
    from vertex_ray.stages.trace import service_graph

    return service_graph(ds, cfg.get("n_buckets", 32))


def _t_jaeger_encode(cfg, ds):
    """Span rows → one Jaeger PostSpansRequest payload per batch
    (sources/jaeger — the src/sinks/jaeger wire analogue)."""
    from vertex_ray.sources.jaeger import jaeger_encode_op

    return ds.map_batches(
        jaeger_encode_op(cfg.get("service_name", "vertex_ray")),
        batch_format="pyarrow")


def _t_jaeger_decode(cfg, ds):
    """Jaeger payload rows → span rows (the src/sources/jaeger analogue)."""
    from vertex_ray.sources.jaeger import jaeger_decode_op

    return ds.map_batches(jaeger_decode_op(), batch_format="pyarrow")


def _t_json_typed(cfg, ds):
    """Type-tagged extraction from a schemaless JSON column
    (functions/jsonval): ``{"paths": {"m": ".matched"}}`` adds
    ``m_type``/``m_val`` columns."""
    from vertex_ray.functions.jsonval import json_typed_op

    return ds.map_batches(
        json_typed_op(cfg.get("text_col", "doc"), dict(cfg["paths"])),
        batch_format="pyarrow")


def _t_json_dedup(cfg, ds):
    """Type-sensitive exact dedup on dynamic JSON keys (the reference's
    dedup semantics over schemaless Values)."""
    from vertex_ray.functions.jsonval import dedup_json_typed

    return dedup_json_typed(
        ds, cfg.get("text_col", "doc"), dict(cfg["paths"]),
        cfg.get("id_col", "doc_id"), n_buckets=cfg.get("n_buckets", 64))


def _t_langid_ngram(cfg, ds):
    """Hashed char-trigram language ID (stages/langid_ngram), trained on
    the embedded multilingual fixture at build time."""
    import ray.data as rd

    from vertex_ray.stages.langid_ngram import (
        langid_classify,
        langid_train_table,
        train_langid,
    )

    nb = cfg.get("n_buckets", 4096)
    langs, q, _ = train_langid(rd.from_arrow(langid_train_table()),
                               n_buckets=nb)
    return langid_classify(ds, langs, q,
                           text_col=cfg.get("text_col", "text"),
                           id_col=cfg.get("id_col", "doc_id"),
                           n_buckets=nb)


def _t_lsh_signatures(cfg, ds):
    """md5-parity hyperplane LSH bucket signatures over an embedding
    column (stages/ann.lsh_signatures_md5)."""
    from vertex_ray.stages.ann import lsh_signatures_md5

    return lsh_signatures_md5(
        ds, cfg.get("vec_col", "embedding"), cfg.get("id_col", "vec_id"),
        n_planes=cfg.get("n_planes", 16), dim=cfg.get("dim", 64),
        quant=cfg.get("quant", 128))


def _t_route(cfg, ds):
    from vertex_ray.stages.ops import route_split

    routes = {name: _predicate(spec) for name, spec in cfg["routes"].items()}
    return route_split(ds, routes)  # dict of ports


def _t_topk_per_group(cfg, ds):
    from vertex_ray.stages.ops import topk_per_group

    return topk_per_group(ds, cfg["group_col"], cfg["value_col"], cfg["k"],
                          cfg["tiebreak"], cfg.get("keep_cols"))


def _t_mix(cfg, ds):
    from vertex_ray.stages.ops import mix_proportions

    return mix_proportions(ds, cfg["group_col"], cfg["id_col"],
                           dict(cfg["targets"]), cfg["total_out"],
                           cfg.get("denom", 1000))


def _t_stitch(cfg, ds):
    from vertex_ray.stages.text import stitch_conversations

    return stitch_conversations(ds, cfg["key_col"], cfg["order_col"],
                                cfg.get("text_col", "text"),
                                cfg.get("sep", "\n"))


def _t_late_data(cfg, ds):
    from vertex_ray.stages.windows import late_data_flag

    return late_data_flag(ds, cfg["key_col"], cfg["ts_col"], cfg["seq_col"],
                          cfg["allowed_lateness_s"], cfg["window_s"])


def _t_label_aggregate(cfg, ds):
    from vertex_ray.stages.promql import label_aggregate

    return label_aggregate(ds, cfg["label"], cfg["value_col"],
                           window_col=cfg.get("window_col", "window_start"),
                           out_col=cfg.get("out_col"),
                           key_col=cfg.get("key_col", "series_key"),
                           agg=cfg.get("agg", "sum"),
                           q=cfg.get("q", 0.5))


def _t_over_time(cfg, ds):
    from vertex_ray.stages.promql import over_time

    return over_time(ds, cfg["key_col"], cfg["order_col"], cfg["value_col"],
                     cfg["n"], agg=cfg.get("agg", "avg"),
                     out_col=cfg.get("out_col"), q=cfg.get("q", 0.5))


def _t_zscore(cfg, ds):
    from vertex_ray.stages.promql import zscore_over_time

    return zscore_over_time(ds, cfg["key_col"], cfg["order_col"],
                            cfg["value_col"], cfg["n"],
                            out_col=cfg.get("out_col", "zscore"))


def _t_holt_winters(cfg, ds):
    from vertex_ray.stages.promql import holt_winters

    return holt_winters(ds, cfg["key_col"], cfg["order_col"],
                        cfg["value_col"], sf=cfg.get("sf", 0.4),
                        tf=cfg.get("tf", 0.3),
                        out_col=cfg.get("out_col", "smoothed"))


def _t_predict_linear(cfg, ds):
    from vertex_ray.stages.promql import predict_linear

    return predict_linear(ds, cfg["key_col"], cfg["order_col"],
                          cfg["value_col"], cfg["n"], cfg["steps_ahead"],
                          cfg["tier_seconds"])


def _t_deriv(cfg, ds):
    from vertex_ray.stages.promql import deriv

    return deriv(ds, cfg["key_col"], cfg["order_col"], cfg["value_col"],
                 cfg["n"], cfg["tier_seconds"])


def _t_label_replace(cfg, ds):
    from vertex_ray.stages.promql import label_replace

    return label_replace(ds, cfg["dst"], cfg["replacement"], cfg["src"],
                         cfg["regex"])


def _t_label_join(cfg, ds):
    from vertex_ray.stages.promql import label_join

    return label_join(ds, cfg["dst"], cfg.get("sep", ""), cfg["srcs"])


def _t_clamp(cfg, ds):
    from vertex_ray.stages.promql import clamp

    return clamp(ds, cfg["value_col"], lo=cfg.get("lo"), hi=cfg.get("hi"))


def _t_irate_idelta(cfg, ds):
    from vertex_ray.stages.promql import irate_idelta

    return irate_idelta(ds, cfg["key_col"], cfg["order_col"],
                        cfg["value_col"])


def _t_count_values(cfg, ds):
    from vertex_ray.stages.promql import count_values

    return count_values(ds, cfg["value_col"],
                        window_col=cfg.get("window_col", "window_start"))


def _t_absent(cfg, ds):
    from vertex_ray.stages.promql import absent_over_time

    return absent_over_time(
        ds, cfg.get("window_col", "window_start"),
        tier_seconds=cfg.get("tier_seconds", 60),
        start=cfg.get("start"), end=cfg.get("end"))


def _t_offset(cfg, ds):
    from vertex_ray.stages.promql import offset_modifier

    return offset_modifier(ds, cfg.get("window_col", "window_start"),
                           cfg["offset_seconds"],
                           rename=cfg.get("rename"))


def _t_window_time(cfg, ds):
    from vertex_ray.stages.promql import window_time

    return ds.map_batches(
        lambda t: window_time(t, cfg.get("window_col", "window_start"),
                              cfg.get("part", "hour"),
                              cfg.get("out_col")),
        batch_format="pyarrow")


def _t_hist_fraction(cfg, ds):
    from vertex_ray.stages.quantile import histogram_fraction_batch

    return ds.map_batches(
        lambda t: histogram_fraction_batch(
            t, cfg["lo"], cfg["hi"],
            out_col=cfg.get("out_col", "fraction")),
        batch_format="pyarrow")


def _t_limit_ratio(cfg, ds):
    from vertex_ray.stages.promql import limit_ratio

    return limit_ratio(ds, cfg.get("key_col", "series_key"), cfg["ratio"])


def _t_aggregate_without(cfg, ds):
    from vertex_ray.stages.promql import aggregate_without

    return aggregate_without(ds, cfg["drop_labels"], cfg["value_col"],
                             window_col=cfg.get("window_col",
                                                "window_start"),
                             agg=cfg.get("agg", "sum"))


def _t_resample(cfg, ds):
    from vertex_ray.stages.promql import resample_windows

    return resample_windows(ds, cfg["step_seconds"], cfg["tier_seconds"],
                            cfg["col_ops"],
                            key_col=cfg.get("key_col", "series_key"),
                            window_col=cfg.get("window_col",
                                               "window_start"))


def _t_limitk(cfg, ds):
    from vertex_ray.stages.promql import limitk

    return limitk(ds, cfg.get("key_col", "series_key"), cfg["k"])


def _t_gopher(cfg, ds):
    from vertex_ray.stages.text import gopher_rules_op

    return ds.map_batches(
        gopher_rules_op(cfg.get("text_col", "text"),
                        cfg.get("id_col", "doc_id")),
        batch_format="pyarrow")


def _t_compression_ratio(cfg, ds):
    from vertex_ray.stages.text import compression_ratio_op

    return ds.map_batches(
        compression_ratio_op(cfg.get("text_col", "text"),
                             cfg.get("id_col", "doc_id"),
                             max_ratio=cfg.get("max_ratio", 0.98),
                             min_ratio=cfg.get("min_ratio", 0.25)),
        batch_format="pyarrow")


def _t_kll_quantiles(cfg, ds):
    from vertex_ray.stages.sketch import kll_quantiles

    return kll_quantiles(ds, cfg["value_col"], cfg["qs"],
                         k=cfg.get("k", 200),
                         group_col=cfg.get("group_col"))


def _t_url_domains(cfg, ds):
    from vertex_ray.stages.text import url_domain_op

    return ds.map_batches(
        url_domain_op(cfg.get("text_col", "text"),
                      cfg.get("id_col", "doc_id")),
        batch_format="pyarrow")


def _t_domain_freq(cfg, ds):
    from vertex_ray.stages.text import domain_freq

    blocked = cfg.get("blocked")
    return domain_freq(ds, cfg.get("text_col", "text"),
                       cfg.get("id_col", "doc_id"),
                       blocked=frozenset(blocked) if blocked else None)


def _t_pii_redact(cfg, ds):
    from vertex_ray.stages.text import pii_redact_op

    return ds.map_batches(
        pii_redact_op(cfg.get("text_col", "text"),
                      cfg.get("id_col", "doc_id")),
        batch_format="pyarrow")


def _t_mixture(cfg, ds):
    from vertex_ray.stages.text import mixture_sample

    return mixture_sample(ds, cfg.get("group_col", "source"),
                          cfg.get("key_col", "doc_id"), cfg["weights"],
                          default=cfg.get("default", 0.0))


def _t_dsir(cfg, ds):
    from vertex_ray.stages.text import dsir_affinity

    return dsir_affinity(ds, cfg.get("text_col", "text"),
                         cfg.get("id_col", "doc_id"),
                         target_col=cfg.get("target_col", "source"),
                         target_value=cfg["target_value"],
                         n_buckets=cfg.get("n_buckets", 1 << 14))


def _t_eval(cfg, ds):
    """The rewrite-transform analogue (/root/reference
    src/transforms/rewrite.rs:72-135 runs a VTL script per event): SET
    derived columns from text expressions (functions/exprlang, compiled
    once, vectorized per batch; later expressions see earlier results)
    and DROP columns — ``{"type": "eval", "set": {"flag": "value > 50"},
    "drop": ["tmp"]}``. A set target containing a ``.`` writes a NESTED
    path inside a struct column (the reference's path-addressed
    ``.a.b = expr`` write, lib/value/src/path/):
    ``{"set": {"doc.meta.flag": "value > 50"}}`` — but ONLY when no flat
    column with the full dotted name exists AND the root segment is a
    struct column or absent; a flat column literally named ``rate.5m``
    keeps flat set/overwrite semantics (ADVICE r3)."""
    import pyarrow as pa

    from vertex_ray.functions.exprlang import compile_expr

    sets = [(name, compile_expr(src))
            for name, src in dict(cfg.get("set", {})).items()]
    drops = list(cfg.get("drop", []))

    def fn(t: pa.Table) -> pa.Table:
        from vertex_ray.functions.path import parse_path, path_set

        for name, f in sets:
            v = f(t)
            if not hasattr(v, "type"):  # scalar result → broadcast
                v = pa.array([v] * len(t))
            root, _, rest = name.partition(".")
            path_write = (
                rest != ""
                and name not in t.schema.names  # flat dotted name wins
                and (root not in t.schema.names
                     or pa.types.is_struct(t.schema.field(root).type)))
            if path_write:  # nested path write into a struct column
                base = (t[root].combine_chunks()
                        if root in t.schema.names else pa.nulls(len(t)))
                v = path_set(base, parse_path(rest), v)
                name = root
            if name in t.schema.names:
                t = t.set_column(t.schema.get_field_index(name), name, v)
            else:
                t = t.append_column(name, v)
        if drops:
            t = t.drop_columns([c for c in drops if c in t.schema.names])
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def _t_lm_perplexity(cfg, ds):
    from vertex_ray.stages.text import bigram_lm_perplexity

    return bigram_lm_perplexity(
        ds, cfg.get("text_col", "text"), cfg.get("id_col", "doc_id"),
        train_col=cfg.get("train_col"),
        train_value=cfg.get("train_value"),
        n_buckets=cfg.get("n_buckets", 1 << 14))


def _t_boilerplate(cfg, ds):
    from vertex_ray.stages.text import remove_boilerplate_lines

    return remove_boilerplate_lines(
        ds, cfg.get("text_col", "text"), cfg.get("id_col", "doc_id"),
        cfg.get("max_doc_freq", 1))


def _t_set_op(cfg, dss):
    from vertex_ray.stages.promql import set_op

    left, right = dss
    return set_op(left, right, cfg["on_cols"], op=cfg.get("op", "and"))


def _t_binary_op(cfg, dss):
    from vertex_ray.stages.promql import binary_op

    left, right = dss
    return binary_op(left, right, cfg["on_cols"], cfg["left_val"],
                     cfg["right_val"], op=cfg.get("op", "div"),
                     out_col=cfg.get("out_col", "value"),
                     carry_left=cfg.get("carry_left"),
                     bool_mode=cfg.get("bool_mode", False))


def _t_burn_rate(cfg, ds):
    from vertex_ray.stages.promql import burn_rate

    return burn_rate(ds, cfg["key_col"], cfg["order_col"], cfg["bad_col"],
                     cfg["total_col"], cfg["n_fast"], cfg["n_slow"],
                     cfg["budget"], cfg["factor"])


def _t_epoch_shuffle(cfg, ds):
    from vertex_ray.stages.shuffle import epoch_shuffle

    return epoch_shuffle(ds, cfg["id_col"], cfg["seed"])


def _t_alert_state(cfg, ds):
    from vertex_ray.stages.promql import alert_state

    return alert_state(ds, cfg["key_col"], cfg["order_col"],
                       cfg["value_col"], cfg["threshold"],
                       cfg["for_windows"], cfg["tier_seconds"])


def _t_resets_changes(cfg, ds):
    from vertex_ray.stages.promql import resets_changes

    return resets_changes(ds, cfg["key_col"], cfg["order_col"],
                          cfg["value_col"], cfg["n"])


def _t_lttb(cfg, ds):
    from vertex_ray.stages.promql import lttb_downsample

    return lttb_downsample(ds, cfg["key_col"], cfg["order_col"],
                           cfg["value_col"], cfg["n_out"])


def _t_unigram_score(cfg, ds):
    from vertex_ray.stages.text import unigram_freq_score

    return unigram_freq_score(ds, cfg.get("text_col", "text"),
                              cfg.get("id_col", "doc_id"),
                              method=cfg.get("method", "broadcast"))


def _t_semantic_dedup(cfg, ds):
    from vertex_ray.stages.dedup_near import semantic_dedup

    return semantic_dedup(ds, cfg.get("vec_col", "embedding"),
                          cfg.get("id_col", "vec_id"),
                          k=cfg.get("k", 8),
                          threshold=cfg.get("threshold", 0.9))


def _t_ngram_overlap(cfg, ds):
    from vertex_ray.stages.dedup_near import ngram_overlap_pairs

    return ngram_overlap_pairs(ds, cfg.get("text_col", "text"),
                               cfg.get("id_col", "doc_id"),
                               k=cfg.get("k", 8),
                               min_shared=cfg.get("min_shared", 1))


def _t_record_rule(cfg, ds):
    from vertex_ray.stages.record import record_rule

    return record_rule(ds, label=cfg["label"], value_col=cfg["value_col"],
                       new_metric=cfg["new_metric"], tier=cfg["tier"],
                       agg=cfg.get("agg", "sum"))


def _t_group_sum(cfg, ds):
    from vertex_ray.stages.promql import group_sum

    return group_sum(ds, list(cfg["group_cols"]), list(cfg["value_cols"]),
                     n_buckets=cfg.get("n_buckets", 64))


def _t_vocab(cfg, ds):
    from vertex_ray.stages.text import vocab_topk

    return vocab_topk(ds, cfg.get("text_col", "text"), cfg["k"])


def _t_tfidf(cfg, ds):
    from vertex_ray.stages.text import tfidf_top_terms

    return tfidf_top_terms(ds, cfg.get("text_col", "text"), cfg["id_col"],
                           cfg.get("k", 3))


# --- multi-input transform builders (cfg, [ds, ...]) ------------------------


def _t_join(cfg, inputs):
    from vertex_ray.stages.join import hash_join

    left, right = inputs
    return hash_join(left, right, cfg["left_on"], cfg.get("right_on"),
                     how=cfg.get("how", "inner"),
                     n_buckets=cfg.get("n_buckets", 64),
                     rsuffix=cfg.get("rsuffix", "_r"))


def _t_join_skewed(cfg, inputs):
    from vertex_ray.stages.join import hash_join_skewed

    left, right = inputs
    return hash_join_skewed(
        left, right, cfg["left_on"], cfg.get("right_on"),
        how=cfg.get("how", "inner"), n_buckets=cfg.get("n_buckets", 64),
        hot_keys=cfg.get("hot_keys"),
        hot_fraction=cfg.get("hot_fraction", 0.01))


def _t_asof_join(cfg, inputs):
    from vertex_ray.stages.joins import asof_join

    left, right = inputs
    return asof_join(left, right, key=tuple(cfg["key"]), ts=tuple(cfg["ts"]),
                     left_cols=list(cfg["left_cols"]),
                     right_cols=list(cfg["right_cols"]),
                     right_tiebreak=cfg["right_tiebreak"],
                     n_buckets=cfg.get("n_buckets", 64))


def _t_decontaminate(cfg, inputs):
    from vertex_ray.stages.text import decontaminate

    candidates, benchmark = inputs
    return decontaminate(candidates, benchmark, cfg.get("text_col", "text"),
                         cfg["id_col"], k=cfg.get("k", 3),
                         min_overlap=cfg.get("min_overlap", 1))


MULTI_INPUT_TYPES = {"join", "join_skewed", "asof_join", "decontaminate",
                     "binary_op", "set_op"}

STEP_TYPES: dict[str, Callable] = {
    # sources
    "parquet": _src_parquet,
    "jsonl": _src_text_codec("decode_json_lines"),
    "logfmt": _src_text_codec("decode_logfmt"),
    "syslog": _src_text_codec("decode_syslog"),
    # transforms
    "filter": _t_filter,
    "sample": _t_sample,
    "relabel": _t_relabel,
    "dedup": _t_dedup,
    "throttle": _t_throttle,
    "throttle_gcra": _t_throttle_gcra,
    "metricalize": _t_metricalize,
    "summarize": _t_summarize,
    "route": _t_route,
    "spans": _t_spans,
    "trace_assemble": _t_trace_assemble,
    "service_graph": _t_service_graph,
    "jaeger_encode": _t_jaeger_encode,
    "jaeger_decode": _t_jaeger_decode,
    "json_typed": _t_json_typed,
    "json_dedup": _t_json_dedup,
    "langid_ngram": _t_langid_ngram,
    "lsh_signatures": _t_lsh_signatures,
    "tokens": _t_text_op("token_count_op"),
    "quality": _t_text_op("quality_score_op"),
    "langid": _t_text_op("lang_id_op"),
    "fingerprint": _t_text_op("fingerprint_op"),
    "topk_per_group": _t_topk_per_group,
    "mix": _t_mix,
    "stitch": _t_stitch,
    "late_data": _t_late_data,
    "vocab": _t_vocab,
    "tfidf": _t_tfidf,
    "label_aggregate": _t_label_aggregate,
    "over_time": _t_over_time,
    "group_sum": _t_group_sum,
    "zscore": _t_zscore,
    "holt_winters": _t_holt_winters,
    "predict_linear": _t_predict_linear,
    "deriv": _t_deriv,
    "irate_idelta": _t_irate_idelta,
    "label_replace": _t_label_replace,
    "label_join": _t_label_join,
    "clamp": _t_clamp,
    "alert_state": _t_alert_state,
    "epoch_shuffle": _t_epoch_shuffle,
    "burn_rate": _t_burn_rate,
    "count_values": _t_count_values,
    "absent": _t_absent,
    "offset": _t_offset,
    "window_time": _t_window_time,
    "hist_fraction": _t_hist_fraction,
    "limit_ratio": _t_limit_ratio,
    "limitk": _t_limitk,
    "kll_quantiles": _t_kll_quantiles,
    "resample": _t_resample,
    "gopher": _t_gopher,
    "compression_ratio": _t_compression_ratio,
    "pii_redact": _t_pii_redact,
    "url_domains": _t_url_domains,
    "domain_freq": _t_domain_freq,
    "boilerplate": _t_boilerplate,
    "mixture": _t_mixture,
    "dsir": _t_dsir,
    "lm_perplexity": _t_lm_perplexity,
    "eval": _t_eval,
    "aggregate_without": _t_aggregate_without,
    "resets_changes": _t_resets_changes,
    "lttb": _t_lttb,
    "unigram_score": _t_unigram_score,
    "semantic_dedup": _t_semantic_dedup,
    "ngram_overlap": _t_ngram_overlap,
    "record_rule": _t_record_rule,
    # multi-input (inputs are passed as an ordered list, not unioned)
    "join": _t_join,
    "join_skewed": _t_join_skewed,
    "asof_join": _t_asof_join,
    "decontaminate": _t_decontaminate,
    "binary_op": _t_binary_op,
    "set_op": _t_set_op,
}


def expand_multipliers(config: dict) -> dict:
    """Config-level fan-out — the reference's ``multiplier`` source
    (/root/reference src/sources/multiplier/mod.rs:30-37: a component
    TEMPLATE interpolated once per discovered endpoint). A top-level
    ``multipliers`` section instantiates its template per value:

        multipliers:
          per_table:
            var: t
            values: ["events", "orders"]      # or {"glob": "/d/*.parquet"}
            template:
              sources:
                "src_${t}": {type: parquet, path: "/d/${t}.parquet"}

    ``values`` may be a literal list or ``{"glob": pattern}`` (the
    observer-discovery analogue: each match contributes its basename
    sans extension). ``${var}`` interpolates in component NAMES, string
    values, and strings inside lists. Returns a new config with the
    instantiated components merged in; duplicate component names are a
    validation-style error."""
    muls = config.get("multipliers")
    if not muls:
        return config
    import copy
    import glob as _glob
    import os as _os

    out = {k: dict(v) for k, v in config.items() if k != "multipliers"}

    def interp(obj, var, val):
        token = "${" + var + "}"
        if isinstance(obj, str):
            return obj.replace(token, val)
        if isinstance(obj, list):
            return [interp(x, var, val) for x in obj]
        if isinstance(obj, dict):
            return {interp(k, var, val): interp(v, var, val)
                    for k, v in obj.items()}
        return obj

    for mname, m in muls.items():
        var = m.get("var", "value")
        vals = m.get("values", [])
        if isinstance(vals, dict) and "glob" in vals:
            vals = sorted(
                _os.path.splitext(_os.path.basename(p))[0]
                for p in _glob.glob(vals["glob"]))
        tmpl = m.get("template", {})
        for val in vals:
            inst = interp(copy.deepcopy(tmpl), var, str(val))
            for section, comps in inst.items():
                dst = out.setdefault(section, {})
                for cname, cfg in comps.items():
                    if cname in dst:
                        raise ValueError(
                            f"multiplier {mname}: component {cname!r} "
                            f"already defined (value {val!r})")
                    dst[cname] = cfg
    return out


_ENV_RE = None  # compiled lazily (module import stays cheap)


def interpolate_env(config: dict, env: dict | None = None) -> dict:
    """Shell-parameter-expansion interpolation over every string in the
    config — the reference's config loader
    (lib/framework/src/config/loading/env.rs:7-15 regex, bash semantics):

    * ``$$``            → literal ``$``
    * ``$NAME`` / ``${NAME}``        → value (error if undefined)
    * ``${NAME-word}`` / ``${NAME:-word}``  → default when unset
      (``:-`` also when empty)
    * ``${NAME?msg}`` / ``${NAME:?msg}``    → error when unset
      (``:?`` also when empty)

    ``env`` defaults to the process environment plus ``HOSTNAME``
    (env.rs:17-31). All errors are collected and raised together."""
    import os as _os
    import re as _re
    import socket as _socket

    global _ENV_RE
    if _ENV_RE is None:
        _ENV_RE = _re.compile(
            r"\$\$|\$([A-Za-z0-9_.]+)"
            r"|\$\{([A-Za-z0-9_.]+)(?:(:?-|:?\?)([^}]*))?\}")
    if env is None:
        env = dict(_os.environ)
        env.setdefault("HOSTNAME", _socket.gethostname())
    errs: list[str] = []

    def repl(m):
        if m.group(0) == "$$":
            return "$"
        name = m.group(1) or m.group(2)
        flags = m.group(3) or ""
        word = m.group(4) or ""
        val = env.get(name)
        if flags in ("-", ":-"):
            unset = val is None if flags == "-" else not val
            return word if unset else val
        if flags in ("?", ":?"):
            unset = val is None if flags == "?" else not val
            if unset:
                errs.append(
                    f"env var {name!r}: "
                    + (word or "required but unset"))
                return ""
            return val
        if val is None:
            errs.append(f"env var {name!r} is undefined")
            return ""
        return val

    def walk(o):
        if isinstance(o, str):
            return _ENV_RE.sub(repl, o)
        if isinstance(o, list):
            return [walk(x) for x in o]
        if isinstance(o, dict):
            return {walk(k): walk(v) for k, v in o.items()}
        return o

    out = walk(config)
    if errs:
        raise ValueError("config interpolation: " + "; ".join(errs))
    return out


def resolve_secrets(config: dict, stores: dict) -> dict:
    """``SECRET[store.key]`` resolution — the reference's secret loader
    (lib/framework/src/config/loading/secret.rs:20-21 collector regex).
    ``stores`` maps store name → dict of secrets, or
    ``{"type": "file", "path": ...}`` (a JSON file, the file-backed
    SecretStore analogue). Unknown store/key is a collected error."""
    import json as _json
    import re as _re

    pat = _re.compile(r"SECRET\[([A-Za-z0-9_]+)\.([A-Za-z0-9_.\-]+)\]")
    loaded: dict[str, dict] = {}
    for name, st in (stores or {}).items():
        if isinstance(st, dict) and st.get("type") == "file":
            with open(st["path"]) as f:
                loaded[name] = _json.load(f)
        else:
            loaded[name] = dict(st)
    errs: list[str] = []

    def repl(m):
        store, key = m.group(1), m.group(2)
        if store not in loaded:
            errs.append(f"unknown secret store {store!r}")
            return ""
        if key not in loaded[store]:
            errs.append(f"secret {store}.{key} not found")
            return ""
        return str(loaded[store][key])

    def walk(o):
        if isinstance(o, str):
            return pat.sub(repl, o)
        if isinstance(o, list):
            return [walk(x) for x in o]
        if isinstance(o, dict):
            return {k: walk(v) for k, v in o.items()}
        return o

    out = walk(config)
    if errs:
        raise ValueError("config secrets: " + "; ".join(errs))
    return out


def load_config(config: dict, env: dict | None = None,
                secret_stores: dict | None = None) -> dict:
    """The reference's full config-load pipeline: env interpolation →
    secret resolution → multiplier expansion. Returns a concrete config
    ready for validate()/build()."""
    out = interpolate_env(config, env)
    if secret_stores is not None:
        out = resolve_secrets(out, secret_stores)
    return expand_multipliers(out)


def config_diff(old: dict, new: dict) -> dict:
    """The ConfigDiff analogue (the reference's reload path,
    src/launch.rs:219-295, rebuilds only changed pieces of the
    topology): compare two configs component-by-component (after
    multiplier expansion) and compute which components a reload must
    rebuild — every added or changed component plus everything
    downstream of a change (its Dataset chains were built from the old
    upstream objects). Returns dict with ``added``, ``removed``,
    ``changed``, ``to_rebuild``, ``reusable`` (sorted name lists;
    sinks included)."""
    old = expand_multipliers(old)
    new = expand_multipliers(new)

    def comps(c):
        out = {}
        for section in ("sources", "transforms", "sinks"):
            for n, cfg in c.get(section, {}).items():
                out[n] = (section, cfg)
        return out

    oc, nc = comps(old), comps(new)
    added = [n for n in nc if n not in oc]
    removed = [n for n in oc if n not in nc]
    changed = [n for n in nc if n in oc and oc[n] != nc[n]]
    # downstream closure over the NEW graph's input edges
    children: dict[str, list[str]] = {}
    for n, (_, cfg) in nc.items():
        for i in cfg.get("inputs", []) or []:
            children.setdefault(i.split(".")[0], []).append(n)
    dirty = set(added) | set(changed)
    frontier = list(dirty)
    while frontier:
        cur = frontier.pop()
        for ch in children.get(cur, []):
            if ch not in dirty:
                dirty.add(ch)
                frontier.append(ch)
    return {
        "added": sorted(added),
        "removed": sorted(removed),
        "changed": sorted(changed),
        "to_rebuild": sorted(dirty),
        "reusable": sorted(set(nc) - dirty),
    }


def rebuild(old: dict, new: dict, built: dict) -> tuple[dict, dict]:
    """Reload: revalidate ``new``, rebuild ONLY the components
    config_diff marks dirty, reuse the already-built Dataset chains for
    everything else (reload_config_and_respawn's reuse contract).
    Returns (new_built, diff)."""
    errs = validate(new)
    if errs:
        raise ValueError("invalid pipeline config: " + "; ".join(errs))
    d = config_diff(old, new)
    reuse: dict = {}
    for name in d["reusable"]:
        if name in built:
            reuse[name] = built[name]
        for k, v in built.items():  # multi-port entries (name.port)
            if k.startswith(name + "."):
                reuse[k] = v
    new_built = build(new, prebuilt=reuse)
    return new_built, d


def validate(config: dict) -> list[str]:
    """Dry-build diagnostics (the `vertex validate` analogue): unknown
    types, missing inputs, cycles, sink fan-in. Empty list = valid."""
    try:
        config = expand_multipliers(config)
    except ValueError as e:
        return [str(e)]
    errors = []
    sources = config.get("sources", {})
    transforms = config.get("transforms", {})
    sinks = config.get("sinks", {})
    names = set(sources) | set(transforms)
    for name, cfg in sources.items():
        if cfg.get("type") not in STEP_TYPES:
            errors.append(f"source {name}: unknown type {cfg.get('type')!r}")
    for kind, comp in (("transform", transforms), ("sink", sinks)):
        for name, cfg in comp.items():
            if kind == "transform" and cfg.get("type") not in STEP_TYPES:
                errors.append(f"{kind} {name}: unknown type {cfg.get('type')!r}")
            if not cfg.get("inputs"):
                errors.append(f"{kind} {name}: no inputs")
            for inp in cfg.get("inputs", []):
                if inp.split(".")[0] not in names:
                    errors.append(f"{kind} {name}: undefined input {inp!r}")
    # cycle check over transform edges (Kahn)
    deps = {
        n: {i.split(".")[0] for i in c.get("inputs", []) if i.split(".")[0] in transforms}
        for n, c in transforms.items()
    }
    ready = [n for n, d in deps.items() if not d]
    seen = set(ready)
    while ready:
        cur = ready.pop()
        for n, d in deps.items():
            if n not in seen and cur in d:
                d.discard(cur)
                if not d:
                    seen.add(n)
                    ready.append(n)
    if len(seen) != len(deps):
        errors.append(f"cycle among transforms: {sorted(set(deps) - seen)}")
    return errors


def build(config: dict, prebuilt: dict | None = None) -> dict:
    """Build every component; returns {name: Dataset} for all sources,
    transforms (route ports as 'name.port'), and sink results. Sinks:
    type 'parquet' writes and records {'path', 'rows'}; type 'datasets'
    (default) just exposes the upstream Dataset.

    ``prebuilt`` (the rebuild()/reload path) seeds already-built
    components: those are reused as-is and not reconstructed."""
    errs = validate(config)
    if errs:
        raise ValueError("invalid pipeline config: " + "; ".join(errs))
    config = expand_multipliers(config)
    built: dict = dict(prebuilt or {})
    for name, cfg in config.get("sources", {}).items():
        if name not in built:
            built[name] = STEP_TYPES[cfg["type"]](cfg)

    transforms = dict(config.get("transforms", {}))
    # topological build (validate() guarantees acyclicity)
    remaining = {n: c for n, c in transforms.items() if n not in built}
    while remaining:
        progressed = False
        for name in list(remaining):
            cfg = remaining[name]
            ins = list(cfg["inputs"])
            if not all(i in built or i.split(".")[0] in built for i in ins):
                continue
            ups = [built[i] if i in built else built[i.split(".")[0]]
                   for i in ins]
            if cfg["type"] in MULTI_INPUT_TYPES:
                out = STEP_TYPES[cfg["type"]](cfg, ups)
            else:
                ds = ups[0]
                for up in ups[1:]:
                    ds = ds.union(up)
                out = STEP_TYPES[cfg["type"]](cfg, ds)
            if isinstance(out, dict):  # multi-port (route)
                for port, pds in out.items():
                    built[f"{name}.{port}"] = pds
                built[name] = out.get("_unmatched", next(iter(out.values())))
            else:
                built[name] = out
            del remaining[name]
            progressed = True
        if not progressed:
            raise ValueError(f"unresolvable inputs among {sorted(remaining)}")

    for name, cfg in config.get("sinks", {}).items():
        if name in built:  # reused sink result (rebuild path)
            continue
        ds = None
        for i in cfg["inputs"]:
            up = built[i]
            ds = up if ds is None else ds.union(up)
        if cfg.get("type") == "parquet":
            ds.write_parquet(cfg["path"])
            from vertex_ray.state import fsio
            from vertex_ray.state.checkpoint import stage_files

            rows = sum(
                fsio.parquet_metadata(f).num_rows for f in stage_files(cfg["path"])
            )
            built[name] = {"path": cfg["path"], "rows": rows}
        else:
            built[name] = ds
    return built


def serve_loop(config_path: str, load_config, *, interval: float = 1.0,
               watch: bool = True, max_reloads: int | None = None,
               max_ticks: int | None = None, log=print,
               sleep=None, reload_requested=None):
    """The daemon lifecycle loop — the `serve --watch` analogue of the
    reference's run loop (src/launch.rs:219-295: SIGHUP / file-watch →
    reload_config_and_respawn): build once, then poll the config file's
    mtime every ``interval`` seconds (``watch``) and honor an external
    reload request hook (the SIGHUP analogue); on change, revalidate and
    :func:`rebuild` — only dirty components and their downstream are
    rebuilt, everything else keeps its committed Dataset chains. An
    unparsable or invalid new config is REJECTED and the old topology
    keeps serving (the reference's reload contract); the file is
    re-examined on the next change of mtime.

    Injection points for tests and callers: ``load_config`` (path →
    dict), ``log`` (line sink), ``sleep`` (tick hook — a test can edit
    the file here instead of spawning a thread), ``reload_requested``
    (zero-arg bool, polled each tick). Bounded by ``max_reloads``
    successful reloads and/or ``max_ticks`` polls; unbounded when both
    are None (Ctrl-C exits). Returns (config, built, n_reloads)."""
    import os as _os
    import time as _time

    sleep = sleep or _time.sleep
    cfg = load_config(config_path)
    errs = validate(cfg)
    if errs:
        raise ValueError("invalid pipeline config: " + "; ".join(errs))
    built = build(cfg)
    log(f"serve: built {len(built)} components from {config_path}")
    try:
        mtime = _os.stat(config_path).st_mtime_ns
    except FileNotFoundError:
        mtime = None
    reloads = ticks = 0
    while (max_reloads is None or reloads < max_reloads) and (
            max_ticks is None or ticks < max_ticks):
        sleep(interval)
        ticks += 1
        want = bool(reload_requested()) if reload_requested else False
        if watch:
            try:
                st = _os.stat(config_path).st_mtime_ns
            except FileNotFoundError:
                log(f"serve: config vanished: {config_path} "
                    "(old topology keeps serving)")
                continue
            if st != mtime:
                mtime = st
                want = True
        if not want:
            continue
        try:
            new = load_config(config_path)
        except Exception as e:
            log(f"serve: reload failed to parse "
                f"(old topology keeps serving): {e}")
            continue
        try:
            built, diff = rebuild(cfg, new, built)
        except Exception as e:  # noqa: BLE001 — ANY build failure (bad
            # param → KeyError, missing file → FileNotFoundError, …)
            # must reject the reload and keep the old topology serving,
            # exactly like a validation failure; only the daemon owner
            # may kill the daemon
            log(f"serve: reload rejected "
                f"(old topology keeps serving): {type(e).__name__}: {e}")
            continue
        cfg = new
        reloads += 1
        log("serve: reloaded #%d — changed=%s added=%s removed=%s "
            "rebuilt=%s reused=%s" % (
                reloads, diff["changed"], diff["added"], diff["removed"],
                diff["to_rebuild"], diff["reusable"]))
    return cfg, built, reloads
