"""The quality-filter pipeline: scan → validate → score → scrub → label.

Spark re-imagination of the reference's validate_json orchestration
(/root/reference/data-quality-server/src/json_validation.rs:17-149): what
the reference does per HTTP request becomes ONE declarative plan per batch —
a single narrow select chain (whole-stage codegen) plus exactly one shuffle
(duplicate-turn detection on the composite key (conv_id, turn_idx)).

Scale design (100 TB / 10^12 turns):
  * All heuristic rules + scrub are native expressions → JVM, codegen, no
    Python in the hot path; filters/column pruning push to the Parquet scan.
  * The model scores are ONE iterator pandas UDF (Arrow batches, broadcast
    models) computing langid+perplexity in a single hashing pass.
  * The only wide dependency keys on (conv_id, turn_idx) — high cardinality,
    no conversation-length skew. Conversation-LEVEL grouping (stable output
    ordering) partitions by conv_id only where requested, with a documented
    salting helper for pathological conversations.
  * AQE handles partition coalescing; output is repartitioned by conv_id and
    sorted within partitions for stable (conv_id, turn_idx) ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import DEFAULT_RULESET, RuleSet
from ..functions import rules
from ..functions.scrub import scrub_column
from ..functions.udfs import broadcast_models, make_scores_udf

FEATURE_NAMES = (
    "n_chars", "n_words", "n_lines", "mean_word_len", "max_word_len",
    "symbol_ratio", "stopword_frac", "alpha_frac", "dup_line_frac",
    "bullet_frac", "ellipsis_frac",
)


def dup_flag_column(df: DataFrame, strategy: str = "broadcast"):
    """(df', dup_count_col) marking duplicated (conv_id, turn_idx) keys.

    strategy='broadcast' (default, the 100 TB path): aggregate a 2-column
    projection — the shuffle carries only (conv_id, turn_idx), never text —
    then broadcast-join the (rare) duplicated keys back. Falls back to
    strategy='window' (full-row shuffle) when duplicate keys are expected to
    be a large fraction of the input and would not fit in a broadcast.
    """
    if strategy == "none":
        # streaming path: no global view per micro-batch — dup handling is
        # dropDuplicates-within-watermark upstream or a batch sweep later
        return df, F.lit(1)
    if strategy == "window":
        return df, F.count(F.lit(1)).over(
            Window.partitionBy("conv_id", "turn_idx"))
    dup_keys = (
        df.groupBy("conv_id", "turn_idx")
        .agg(F.count(F.lit(1)).alias("_dup_count"))
        .filter(F.col("_dup_count") > 1)
        .select(F.col("conv_id").alias("_dk_conv"),
                F.col("turn_idx").alias("_dk_idx"), "_dup_count")
    )
    # null-safe keys: the window/DuckDB/oracle twins group NULL keys together
    joined = df.join(
        F.broadcast(dup_keys),
        F.col("conv_id").eqNullSafe(F.col("_dk_conv"))
        & F.col("turn_idx").eqNullSafe(F.col("_dk_idx")),
        "left",
    )
    return joined, F.coalesce(F.col("_dup_count"), F.lit(1))


def label_turns(
    df: DataFrame,
    cfg: RuleSet = DEFAULT_RULESET,
    *,
    with_models: bool = True,
    bc_models=None,
    keep_features: bool = False,
    dup_strategy: str = "broadcast",
    measure_latency: bool = False,
    models_on_survivors: bool = False,
) -> DataFrame:
    """Add keep/drop_reasons/text_scrubbed (+ lang/lang_conf/ppl) columns.

    `with_models=False` gives the heuristic-only pipeline (fully
    SQL-expressible — used by the DuckDB correctness oracle).
    `measure_latency=True` (models only) also emits `batch_us` — the
    measured per-Arrow-batch scoring duration (D10 histogram source,
    operators/latency.py); score values are bit-identical either way.

    `models_on_survivors=True` is the cheap-filters-first 100 TB mode:
    rows already dropped by the validation/heuristic rules feed NULL text
    into the scoring UDF (near-zero hashing work — Spark does not
    guarantee conditional-UDF skipping, so nulling the INPUT is the
    reliable form) and emit NULL lang/lang_conf/ppl. Keep/drop decisions
    are IDENTICAL to the eager mode (model rules can only re-drop
    survivors); only the scored columns of already-dropped rows differ,
    which is why the gate keeps the eager default."""
    text = F.col("text")
    in_cols = df.columns

    out, dup_count = dup_flag_column(df, dup_strategy)

    # materialize shared arrays + feature values ONCE per row (CollapseProject
    # keeps multi-referenced non-cheap aliases in their own projection, so
    # split/translate run once instead of once per consuming rule)
    out = out.withColumns(rules.split_columns(text))
    feat_exprs = rules.feature_columns_from(
        text, F.col("_words"), F.col("_lines"))
    out = out.withColumns({f"_f_{k}": v for k, v in feat_exprs.items()})
    feats = {k: F.col(f"_f_{k}") for k in feat_exprs}

    cols = {c: F.col(c) for c in ("conv_id", "turn_idx", "role", "text",
                                  "tool", "ts")}
    flags = rules.validation_flags(cols, cfg, dup_count)
    flags += rules.heuristic_flags(feats, text, cfg)

    if with_models:
        if bc_models is None:
            bc_models = broadcast_models(df.sparkSession)
        scores = make_scores_udf(bc_models, timed=measure_latency)
        if models_on_survivors:
            # rule-only keep decision, evaluated BEFORE the model pass
            rule_keep = F.size(rules.reasons_array(flags)) == 0
            out = out.withColumn("_rk", rule_keep)
            out = out.withColumn(
                "_scores", scores(F.when(F.col("_rk"), text)))
            guard = F.col("_rk")
        else:
            out = out.withColumn("_scores", scores(text))
            guard = F.lit(True)
        lang = F.when(guard, F.col("_scores.lang"))
        lang_conf = F.when(guard, F.col("_scores.lang_conf"))
        ppl = F.when(guard, F.col("_scores.ppl"))
        flags = flags + [
            ("lang_conf", guard & text.isNotNull()
             & (F.col("_scores.lang_conf") < cfg.min_lang_conf)),
            ("perplexity", guard & text.isNotNull()
             & (F.col("_scores.ppl") > cfg.max_perplexity)),
        ]

    drop_reasons = rules.reasons_array(flags)
    out = out.withColumn("drop_reasons", drop_reasons)
    out = out.withColumn("keep", F.size("drop_reasons") == 0)
    out = out.withColumn("text_scrubbed", scrub_column(text))
    if with_models:
        out = (
            out.withColumn("lang", lang)
            .withColumn("lang_conf", lang_conf)
            .withColumn("ppl", ppl)
        )
        if measure_latency:
            out = out.withColumn("batch_us", F.col("_scores.batch_us"))
    if keep_features:
        out = out.withColumns({name: feats[name] for name in FEATURE_NAMES})
    final_cols = in_cols + ["drop_reasons", "keep", "text_scrubbed"]
    if with_models:
        final_cols += ["lang", "lang_conf", "ppl"]
        if measure_latency:
            final_cols += ["batch_us"]
    if keep_features:
        final_cols += list(FEATURE_NAMES)
    return out.select(*final_cols)


def observe_labels(labeled: DataFrame, name: str = "qf"):
    """Attach a Spark Observation to the labeled stream: keep/drop counts
    collected DURING the job's own pass (no second action) — the in-flight
    form of the reference's request counter (metrics.rs:17-21), complementing
    the persisted metrics_table. Returns (df, observation); read
    `observation.get` after an action completes."""
    from pyspark.sql import Observation

    obs = Observation(name)
    out = labeled.observe(
        obs,
        F.count(F.lit(1)).alias("n_turns"),
        F.count_if(F.col("keep")).alias("n_kept"),
        F.count_if(~F.col("keep")).alias("n_dropped"),
    )
    return out, obs


def conversation_filter(labeled: DataFrame,
                        max_drop_permille: int = 500) -> DataFrame:
    """Conversation-LEVEL keep decision over per-turn labels: a
    conversation survives iff its dropped-turn share is ≤
    max_drop_permille/1000 (a mostly-junk conversation poisons its
    surviving turns' context, so corpus curation drops it whole).

    Integer share math (n_dropped·1000 ≤ permille·n_turns) — no float
    division, engine-exact. One map-side-combinable aggregate keyed on
    conv_id; join the result back (broadcast if small) to materialize the
    filtered corpus."""
    return (
        labeled.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.count_if(~F.col("keep")).alias("n_dropped"),
        )
        .withColumn(
            "conv_keep",
            F.col("n_dropped") * 1000
            <= F.lit(max_drop_permille) * F.col("n_turns"))
    )


def apply_conversation_filter(labeled: DataFrame,
                              max_drop_permille: int = 500) -> DataFrame:
    """Materialize the conversation-filtered corpus: kept turns of kept
    conversations. The conv-keep side is one row per conversation — AQE
    broadcasts it while it fits; at 10^9+ conversations the join-back
    degrades to a shuffle on conv_id, which downstream stable_order
    repartitions on anyway (same key — the exchange is reused, not
    added)."""
    keep_convs = (conversation_filter(labeled, max_drop_permille)
                  .filter(F.col("conv_keep")).select("conv_id"))
    return labeled.filter(F.col("keep")).join(keep_convs, "conv_id")


def stable_order(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Stable (conv_id, turn_idx) ordering: hash-partition by conv_id, sort
    within partitions. One shuffle; downstream readers see each conversation
    contiguous and in turn order."""
    parted = (df.repartition(num_partitions, "conv_id") if num_partitions
              else df.repartition("conv_id"))
    return parted.sortWithinPartitions("conv_id", "turn_idx")


def salted_repartition(df: DataFrame, buckets: int, turns_per_chunk: int = 4096,
                       num_partitions: int | None = None) -> DataFrame:
    """Skew-defusing repartition for conversation-level work: a pathological
    10^5-turn conversation is split into `turn_idx // turns_per_chunk` chunks
    salted across `buckets` partitions; callers re-merge per conv_id only
    where conversation-global context is required."""
    salt = F.pmod(
        F.xxhash64("conv_id", F.floor(F.col("turn_idx") / turns_per_chunk)),
        F.lit(buckets),
    )
    df = df.withColumn("_salt", salt)
    parted = (df.repartition(num_partitions, "conv_id", "_salt")
              if num_partitions else df.repartition("conv_id", "_salt"))
    return parted


def metrics_table(labeled: DataFrame, cfg: RuleSet = DEFAULT_RULESET,
                  *, with_models: bool = True,
                  input_files: bool = True) -> DataFrame:
    """Per-partition lineage + metrics — the batch analog of the reference's
    OTel counter/histogram report (/root/reference/data-quality-server/src/
    metrics.rs:11-31, emission json_validation.rs:44-83).

    One row per (partition, input file): turn counts, keep/drop counts and a
    per-reason histogram map, tagged with the ruleset version.
    """
    from ..config import REASONS

    reasons = [r for r in REASONS
               if with_models or r not in ("lang_conf", "perplexity")]
    file_col = (F.col("_metadata.file_path") if input_files
                else F.lit("<memory>"))
    base = labeled.select(
        F.spark_partition_id().alias("partition_id"),
        file_col.alias("input_file"),
        F.col("keep"),
        F.col("drop_reasons"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_turns"),
        F.count_if(F.col("keep")).alias("n_kept"),
        F.count_if(~F.col("keep")).alias("n_dropped"),
    ]
    reason_entries = []
    for r in reasons:
        reason_entries.append(F.lit(r))
        reason_entries.append(
            F.count_if(F.array_contains("drop_reasons", r))
        )
    metrics = (
        base.groupBy("partition_id", "input_file")
        .agg(*aggs, F.create_map(*reason_entries).alias("reason_counts"))
        .withColumn("ruleset_version", F.lit(cfg.version))
    )
    return metrics


def ruleset_diff(df: DataFrame, cfg_old: RuleSet, cfg_new: RuleSet,
                 *, with_models: bool = False) -> DataFrame:
    """Ruleset-migration impact: label the SAME rows under two ruleset
    versions in ONE pass and report every turn whose keep decision flips,
    with both reason lists.

    The batch analog of the reference's runtime-mutable descriptor
    registry (handlers.rs PUT /descriptors — swap the schema, revalidate):
    before rolling cfg_new over 100 TB, run the diff on a sample and read
    exactly what changes. ONE pass: one scan, one dup-key detection, one
    feature derivation — only the threshold comparisons run twice. No
    self-join (which would also mis-multiply duplicated composite keys).
    """
    text = F.col("text")
    out, dup_count = dup_flag_column(df)
    out = out.withColumns(rules.split_columns(text))
    feat_exprs = rules.feature_columns_from(
        text, F.col("_words"), F.col("_lines"))
    out = out.withColumns({f"_f_{k}": v for k, v in feat_exprs.items()})
    feats = {k: F.col(f"_f_{k}") for k in feat_exprs}
    cols = {c: F.col(c) for c in ("conv_id", "turn_idx", "role", "text",
                                  "tool", "ts")}
    if with_models:
        raise NotImplementedError(
            "model thresholds diff fine too, but the oracle twin is "
            "heuristic-only; score once and compare lang_conf/ppl "
            "thresholds on the scored columns if needed")
    sides = {}
    for tag, cfg in (("old", cfg_old), ("new", cfg_new)):
        flags = rules.validation_flags(cols, cfg, dup_count)
        flags += rules.heuristic_flags(feats, text, cfg)
        reasons = rules.reasons_array(flags)
        sides[tag] = reasons
    out = out.withColumn("_r_old", sides["old"])
    out = out.withColumn("_r_new", sides["new"])
    # The flip filter must NOT be pushed below the _r_/_f_ projections:
    # PushDownPredicates substitutes aliases while pushing, so the pushed
    # condition re-expands EVERY feature (split/translate/HOF) inline —
    # measured 58 split() occurrences vs 2 in the unfiltered plan, i.e.
    # the text re-splits ~20x per row inside one filter. Predicates (even
    # non-deterministic ones) push through any all-deterministic Project,
    # so the barrier must live in the PROJECT FIELDS: `_nd` is a
    # non-deterministic column (spark_partition_id, identically >= 0)
    # that the filter references — the projection holding it can then
    # never host a pushed-through predicate, the filter stays on top,
    # and every feature evaluates once per row from its shared
    # projection. Nothing downstream needs scan-level pushdown (the
    # derivation is narrow and reads every row regardless).
    out = out.withColumn("_nd", F.spark_partition_id())
    flips = (F.size("_r_old") == 0) != (F.size("_r_new") == 0)
    return (
        out.filter(F.when(F.col("_nd") >= 0, flips)
                   .otherwise(F.lit(False)))
        .select(
            "conv_id", "turn_idx",
            (F.size("_r_old") == 0).alias("keep_old"),
            (F.size("_r_new") == 0).alias("keep_new"),
            F.array_join("_r_old", ",").alias("reasons_old"),
            F.array_join("_r_new", ",").alias("reasons_new"),
        )
    )
