"""Corpus-preparation operators for LLM training-data pipelines:
deterministic sampling, vocabulary building, sequence packing.

All pure built-in expressions (JVM, codegen) with exact DuckDB oracle
twins; determinism comes from hashing/ordering on stable ids, never from
RNG state.

Scale notes (100 TB):
- hash sampling is a narrow filter — pipelines with the scan, no shuffle,
  and the SAME rows are selected on any cluster layout (hash of the id,
  not of partition position).
- vocab top-k: explode → per-token partial counts (map-side combine) →
  one shuffle on token → global top-k via a single window over the
  (small) aggregated table.
- sequence packing orders by doc id and assigns each doc to the bin of
  its running token count — a prefix-sum (one window over the sort key).
  At corpus scale, run it per shard/partition key (the window becomes
  per-shard) — bin boundaries then never cross shards, which is what a
  real packer wants anyway for locality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from emr_hudi_example_spark.operators.text import token_count, tokens


def hash_sample(
    df: DataFrame,
    fraction_pct: int,
    id_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Deterministic ~fraction_pct% sample: keep rows whose
    md5(salt || id) falls in the lowest ``fraction_pct`` of the hash
    space. Stable across runs/partitionings; change ``salt`` for an
    independent draw."""
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"),
                                   F.col(id_col).cast("string"))), 1, 4),
        16, 10,
    ).cast("long")  # 16 bits → 0..65535
    return df.filter(bucket * 100 < F.lit(fraction_pct * 65536))


def domain_quota_sample(
    df: DataFrame,
    k: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "q0",
) -> DataFrame:
    """Per-domain quota sampling: keep at most ``k`` rows per
    ``domain_col``, chosen by a deterministic hash priority (md5 of
    salt+id) so the draw is stable across runs and cluster layouts —
    the standard per-source cap that stops one crawl domain from
    dominating a training mix.

    Scale: one shuffle on the domain key, then a per-domain top-k
    window — each domain ranks independently in its own task. For a
    mega-domain (billions of rows, k tiny) pre-thin with
    ``hash_sample`` on the same salt before ranking: the hash priority
    is uniform, so keeping a few × k/|domain| of the hash space
    preserves the exact winners with overwhelming probability, and the
    window then ranks a bounded candidate set.
    """
    prio = F.md5(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(F.col(domain_col)).orderBy(
        prio.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_qrk", F.row_number().over(w))
        .filter(F.col("_qrk") <= k)
        .drop("_qrk")
    )


def vocab_topk(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Top-k lowercased tokens by corpus frequency (ties broken
    alphabetically): the wordcount rollup every tokenizer-training /
    corpus-stats pipeline runs."""
    counts = (
        df.select(F.explode(tokens(text_col)).alias("tok"))
        # drop the phantom '' token of empty/whitespace-only docs (r13)
        .filter(F.length("tok") > 0)
        .select(F.lower(F.col("tok")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # orderBy().limit(k) plans as TakeOrderedAndProject: per-partition
    # top-k heaps + a k-row merge on the driver — never funnels the full
    # distinct-token table through one task the way an unpartitioned
    # row_number window would. The rank window then runs over only the
    # k surviving rows.
    top = counts.orderBy(F.col("freq").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "token", "freq", "rank"
    )


def pack_sequences(
    df: DataFrame,
    window_tokens: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str | None = None,
) -> DataFrame:
    """Assign docs to training-context bins: docs in ``id_col`` order,
    each bin holds ~``window_tokens`` whitespace tokens; a doc lands in
    bin ``floor(running_total_before_doc / window_tokens)``. Greedy
    sequential packing, made deterministic (and SQL-expressible) by the
    id ordering — the standard pre-tokenization packing pass.

    ``shard_col``: when set, the running sum is computed PER SHARD
    (window partitioned by the shard column; ``pack_id`` is unique
    within a shard) — the scale path. A global unpartitioned window
    serializes the whole corpus through one task; per-shard packing is
    also what a real packer wants, since bins never straddle shard —
    i.e. file/worker — boundaries. ``None`` keeps the global semantics
    for small inputs."""
    if shard_col is not None:
        w = (
            Window.partitionBy(F.col(shard_col))
            .orderBy(F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        extra = [F.col(shard_col)]
    else:
        w = (
            Window.orderBy(F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        extra = []
    n_tok = token_count(text_col)
    return df.select(
        F.col(id_col),
        *extra,
        n_tok.alias("n_tokens"),
        F.floor(
            F.coalesce(F.sum(n_tok).over(w), F.lit(0))
            / F.lit(window_tokens)
        ).cast("long").alias("pack_id"),
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pct: tuple[int, int] = (90, 5),
    salt: str = "sp0",
) -> DataFrame:
    """Train/val/test assignment where EXACT DUPLICATES co-travel: the
    split is a deterministic hash of the content FINGERPRINT, not the
    doc id, so two copies of the same text can never straddle train and
    test — the classic eval-leakage bug hash-by-id splits have at
    corpus scale. ``pct = (train, val)`` percents; the remainder is
    test. Returns ``(id_col, fp, split)``.

    Scale shape: a narrow expression chain (normalize → md5 → bucket
    compare) that pipelines with the scan — zero shuffles; integer
    bucket math (16-bit hash space) keeps the decision bit-exact on any
    engine. Near-dup-safe splitting composes the same way on top of
    ``connected_components`` output: hash ``group_id`` instead of fp.
    """
    from emr_hudi_example_spark.operators.text import fingerprint

    fp = fingerprint(text_col)
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), fp)), 1, 4), 16, 10
    ).cast("long")
    train, val = pct
    split = (
        F.when(bucket * 100 < train * 65536, "train")
        .when(bucket * 100 < (train + val) * 65536, "val")
        .otherwise("test")
    )
    return df.select(
        F.col(id_col), fp.alias("fp"), split.alias("split")
    )


def importance_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "im0",
) -> DataFrame:
    """Deterministic importance sampling: keep each row with probability
    proportional to its (non-negative integer) ``weight_col``, scaled so
    the max-weight row is always kept. The keep decision is
    ``hash_bucket * max_weight < weight * 65536`` — pure integer math,
    so Spark and any oracle agree bit-for-bit (no float thresholds),
    and the SAME rows survive under any partitioning (content hash, no
    RNG state). Quality-weighted corpus downsampling in one filter.

    Scale shape: one tiny all-reduce for ``max(weight)`` broadcast as a
    1-row cross join, then a narrow filter that pipelines with the
    scan — the Catalyst plan is scan → BroadcastNestedLoopJoin(1 row) →
    filter, no shuffle of the corpus itself.

    Degenerate weights (r13 review): a row tied with the max weight is
    kept UNCONDITIONALLY — the strict-inequality form alone emptied an
    all-zero-weight corpus, while proportional sampling at all-equal
    weights means probability 1 (the positive-weight path already
    keeps every row when all weights tie). Rows with NULL weight are
    dropped (the contract is non-negative integers).
    """
    wmax = df.agg(F.max(weight_col).alias("_wmax"))
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            1, 4,
        ),
        16, 10,
    ).cast("long")
    return (
        df.crossJoin(F.broadcast(wmax))
        .filter(
            (bucket * F.col("_wmax") < F.col(weight_col) * 65536)
            | (
                F.col(weight_col).isNotNull()
                & (F.col(weight_col) == F.col("_wmax"))
            )
        )
        .drop("_wmax")
    )


def zorder_key(
    cols: list[str],
    bits: int = 16,
    ranges: list[tuple[float, float]] | None = None,
):
    """Z-order (Morton) key: interleave the low ``bits`` bits of each
    integer column into one long — rows sorted by it cluster along ALL
    the dimensions at once, so parquet row-group min/max stats prune
    multi-column range predicates (the Hudi/Delta clustering sort key).
    Pure expression tree (codegen); pair with
    ``LakeTable.compact(sort_by=[...])`` on a column materialized from
    this. Columns are truncated to ``bits`` bits; negative values are
    masked like Java's ``&`` (two's complement).

    ``ranges`` — one ``(lo, hi)`` per column — SCALE-NORMALIZES each
    dimension onto the full ``[0, 2^bits)`` register before the
    interleave: ``scaled = floor((x - lo) * 2^bits / (hi - lo + 1))``,
    clamped. Without it, a column whose values span fewer significant
    bits than a sibling contributes dead high bits, the wide column
    dominates the curve, and the narrow column's ranges never tighten —
    the same reason Hudi/Delta rank-normalize before z-ordering. Get
    ``(lo, hi)`` from the table's manifest column stats or one cheap
    ``agg(min, max)``; integer math is exact (products stay < 2^53).
    """
    n = len(cols)
    if bits * n > 63:
        # bit position 63 would need 2^63, past LongType's max — the
        # expression would overflow/wrap instead of producing a key
        raise ValueError(
            f"zorder_key needs bits*len(cols) <= 63 (got {bits}*{n}="
            f"{bits * n}); reduce bits to {63 // n} for {n} columns"
        )
    if ranges is not None and len(ranges) != n:
        raise ValueError("ranges must have one (lo, hi) per column")
    dims = []
    m = 1 << bits
    for j, c in enumerate(cols):
        x = F.col(c).cast("long")
        if ranges is not None:
            lo, hi = ranges[j]
            span = max(1, int(hi) - int(lo) + 1)
            if span * m > (1 << 53):
                # the scale product must stay double-exact or bucket
                # assignment goes off-by-one at boundaries; 2^53/m is
                # still a ~10^11-wide range at bits=16 — reduce bits or
                # pre-bucket wider domains
                raise ValueError(
                    f"range span {span} * 2^{bits} exceeds 2^53 for "
                    f"column {c!r}; reduce bits or narrow the range"
                )
            # exact integral division: num and num % span are exact
            # LONG arithmetic, their difference is an exact multiple of
            # span <= 2^53, and dividing exact-multiple doubles yields
            # the exact quotient — no FP boundary crossings
            num = (x - F.lit(int(lo))) * m
            scaled = ((num - (num % F.lit(span))) / F.lit(span)).cast(
                "long"
            )
            x = F.least(
                F.greatest(scaled, F.lit(0)), F.lit(m - 1)
            ).cast("long")
        dims.append(x)
    terms = []
    for i in range(bits):
        for j in range(n):
            bit = F.shiftright(dims[j], i).bitwiseAND(F.lit(1))
            terms.append(bit * F.lit(2 ** (i * n + j)).cast("long"))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def mixture_stats(
    df: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain training-mixture statistics: document count, total
    token count and each domain's share of the corpus token budget —
    the table a data-mixture builder weights against. One partial-
    aggregated shuffle on the domain key plus a broadcast of the 1-row
    corpus total; shares are one exact-integer division per domain
    (identical double op on both engines) rounded to 6 dp so the DuckDB
    oracle matches bit-for-bit."""
    return _domain_token_shares(df, domain_col, text_col).select(
        "domain",
        "n_docs",
        "total_tokens",
        F.round("p", 6).alias("token_share"),
    )


def _domain_token_shares(
    df: DataFrame, domain_col: str, text_col: str
) -> DataFrame:
    """Shared per-domain aggregation (r13 review: mixture_stats and
    mixture_temperature carried verbatim copies that could drift):
    ``(domain, n_docs, total_tokens, corpus_tokens, p)`` where ``p`` is
    the domain's exact-integer-derived token share."""
    per_dom = df.select(
        F.col(domain_col).alias("domain"),
        token_count(text_col).cast("long").alias("n_tok"),
    ).groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
    )
    corpus = per_dom.select(
        F.sum("total_tokens").cast("double").alias("corpus_tokens")
    )
    return per_dom.crossJoin(F.broadcast(corpus)).withColumn(
        "p", F.col("total_tokens").cast("double") / F.col("corpus_tokens")
    )


def mixture_temperature(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-flattened domain mixture at τ = 0.5: target sampling
    share ``sqrt(p_d) / Σ sqrt(p_d)`` — the standard multilingual /
    multi-domain rebalance (big domains damped, small ones boosted)
    with the exponent fixed at 0.5 so the power is an exact IEEE
    ``sqrt``, never a platform-dependent ``pow``. The Σ over domains is
    accumulated in DECIMAL(27,18) so the normalizer is order-
    independent (the same trick ``kmeans_refine`` uses) — every output
    double is then a deterministic function of exact integers. Returns
    ``(domain, n_docs, total_tokens, token_share, target_share,
    boost)`` where ``boost`` = target/natural share (the per-domain
    up/down-sampling multiplier a mixture builder applies).

    Scale shape: one partial-aggregated shuffle on the domain key, then
    two 1-row broadcasts (corpus total, normalizer) — the corpus
    streams through once regardless of domain count.
    """
    base = _domain_token_shares(df, domain_col, text_col).withColumn(
        "flat", F.sqrt("p")
    )
    z = base.select(
        F.sum(F.col("flat").cast("decimal(27,18)"))
        .cast("double")
        .alias("zt")
    )
    return base.crossJoin(F.broadcast(z)).select(
        "domain",
        "n_docs",
        "total_tokens",
        F.round("p", 6).alias("token_share"),
        F.round(F.col("flat") / F.col("zt"), 6).alias("target_share"),
        F.round((F.col("flat") / F.col("zt")) / F.col("p"), 6).alias(
            "boost"
        ),
    )


def apply_mixture_boost(
    df: DataFrame,
    boosts: DataFrame | None = None,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "rb0",
) -> DataFrame:
    """Materialize a temperature-rebalanced corpus from per-domain
    boosts (default: :func:`mixture_temperature`'s τ=0.5 table): each
    document is emitted ``floor(boost)`` times plus one more with
    probability ``frac(boost)``, decided by a deterministic id-hash —
    so the resampled corpus realizes the target mixture in expectation
    with zero RNG state and identical output on any layout. The
    fractional compare is ``bucket < floor(frac · 65536)``: 65536 is a
    power of two, so the scaling is an exact exponent shift and the
    threshold is the same integer everywhere. Returns ``(id_col,
    domain_col, copy_idx)`` with ``copy_idx`` ∈ 1..n_copies.

    Scale shape: one broadcast join of the (domains-sized) boost table,
    a narrow per-row sequence explode bounded by ``ceil(max boost)``,
    no corpus shuffle. Upsampling by duplication is how mixture
    builders actually feed samplers at scale (duplicate pointers, not
    bytes — here the id/copy_idx pair IS the pointer table).
    """
    if boosts is None:
        boosts = mixture_temperature(df, domain_col, text_col)
    b = boosts.select(
        F.col("domain").alias(domain_col), "boost"
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            1, 4,
        ),
        16, 10,
    ).cast("long")
    whole = F.floor("boost").cast("long")
    frac = F.col("boost") - F.floor("boost")
    n = (whole + (bucket < F.floor(frac * 65536)).cast("long")).cast("int")
    return (
        df.join(F.broadcast(b), domain_col)
        .withColumn("n_copies", n)
        .filter(F.col("n_copies") >= 1)
        .select(
            F.col(id_col),
            F.col(domain_col),
            F.explode(
                F.sequence(F.lit(1), F.col("n_copies"))
            ).alias("copy_idx"),
        )
    )


def chunk_windows(
    df: DataFrame,
    size: int = 32,
    stride: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping fixed-token windows — the
    context-window chunker that precedes embedding / pretraining
    tokenization. Window ``i`` starts at token ``1 + i*stride`` (1-based)
    and spans up to ``size`` tokens; starts run while they point inside
    the document, so the tail emits short windows (standard behavior —
    no token is dropped).

    Scale shape: tokenize once, generate the start offsets as an array
    (``sequence``), and ``posexplode`` — a narrow per-row expansion that
    pipelines with the scan; no shuffle, no UDF. Output size is
    ~``n_tokens/stride`` rows per doc, the same blow-up any chunker
    pays.
    """
    # NULL-text docs emit no chunks (r13 review: least() ignores the
    # NULL size operand, so a NULL doc produced one phantom chunk
    # claiming chunk_len=size around an empty chunk_text)
    toks = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), tokens(text_col).alias("_tk"))
        .withColumn("_n", F.size("_tk"))
    )
    starts = F.sequence(F.lit(1), F.greatest(F.col("_n"), F.lit(1)),
                        F.lit(stride))
    return toks.select(
        id_col, "_tk", "_n",
        F.posexplode(starts).alias("chunk_id", "_start"),
    ).select(
        F.col(id_col),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("_start").cast("int").alias("chunk_start"),
        F.least(
            F.lit(size), F.col("_n") - F.col("_start") + F.lit(1)
        ).cast("int").alias("chunk_len"),
        F.concat_ws(" ", F.slice("_tk", F.col("_start"), F.lit(size)))
            .alias("chunk_text"),
    )


def training_order(
    df: DataFrame,
    n_shards: int = 8,
    seed: str = "epoch0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training
    order: each row gets a stable pseudo-random key ``md5(seed || id)``,
    a shard (16-bit hash bucket mod ``n_shards``), and its position
    within the shard in key order. Changing ``seed`` yields an
    independent epoch permutation; the layout is identical on any
    cluster topology (pure content hash, no RNG state, no partition-
    position dependence).

    Scale shape: shard assignment is a narrow expression; the
    within-shard ordering is a window PARTITIONED BY shard — shards sort
    in parallel (each ~corpus/n_shards), never a single global sort.
    A trainer streams shard files in position order; global order is the
    shard-interleave, which is exactly how sharded data loaders consume
    corpora at scale.
    """
    key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    bucket = F.conv(F.substring(key, 1, 4), 16, 10).cast("long")
    w = Window.partitionBy("shard").orderBy("shuffle_key")
    return (
        df.select(
            F.col(id_col),
            key.alias("shuffle_key"),
            (bucket % n_shards).cast("int").alias("shard"),
        )
        .withColumn("pos_in_shard", F.row_number().over(w))
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Single-pass column profiler: for every listed column its row
    count, null count, exact distinct count, and min/max (as strings, so
    heterogeneous column types share one output schema). The first
    data-quality report run against any new table/feed.

    Scale shape: ONE aggregation pass over the table computes every
    per-column stat (count/sum-of-nulls/min/max are plain partial aggs;
    the distinct counts expand per column but still partial-aggregate
    map-side), then a constant-size ``stack`` unpivots the 1-row result
    into (column, stats) rows — the table is scanned once regardless of
    how many columns are profiled.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.isnull(c).cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            # native-typed min/max, cast to string only for the shared
            # output schema (numeric columns keep numeric ordering)
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in cols
    )
    return one.selectExpr(
        "__n AS n",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_null, n_distinct, min_str, max_str)",
    ).select("column", "n", "n_null", "n_distinct", "min_str", "max_str")


def stratified_sample(
    df: DataFrame,
    rates_bp: dict[str, int],
    stratum_col: str,
    id_col: str = "doc_id",
    salt: str = "ss0",
    default_bp: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the mixture-shaping step a
    training pipeline runs after quality filtering: each stratum (lang,
    source, domain) keeps its own EXACT hash fraction, expressed in
    basis points (``rates_bp={"en": 5000}`` = keep ~50% of English).
    Strata absent from the map keep ``default_bp``.

    Selection hashes ``salt || id`` — stable under any partitioning /
    cluster layout, independent draws per salt, and dup-safe when the
    id is a content fingerprint (duplicates co-travel in or out, the
    same property the leakage-safe split relies on).

    Scale shape: a pure narrow expression — the rate map becomes an
    inline literal MAP lookup (bounded by stratum cardinality, which is
    small by definition for lang/source mixes), no join, no shuffle,
    nothing to broadcast.
    """
    pairs: list = []
    for k, v in sorted(rates_bp.items()):
        pairs.extend([F.lit(k), F.lit(int(v))])
    rate = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(stratum_col)),
        F.lit(int(default_bp)),
    )
    bucket = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")  # 16 bits -> 0..65535
    return df.filter(bucket * 10000 < rate * 65536)


def dsir_weights(
    df: DataFrame,
    target_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    scale: int = 1_000_000,
) -> DataFrame:
    """DSIR-style data-selection scores (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every document by how target-like its hashed-bigram feature
    distribution is, using smoothed per-feature likelihood ratios
    between the target slice (rows where boolean ``target_col`` is
    true) and the whole corpus.

    Log-free integer variant (graded-value-safe, the repo standard):
    instead of Σ count_f · log(p_tgt(f)/p_raw(f)), each bigram
    occurrence contributes the SCALED smoothed ratio
    ``floor((t_f + 1) · scale / (r_f + 1))`` and the document score is
    the exact BIGINT sum — the same "more target-mass ⇒ larger score"
    ordering on the ratio scale, with zero float ops anywhere.

    Returns ``(id, n_bigrams, dsir_score_ppm)``; docs with < 2 tokens
    score 0. Select the training subset by ranking on
    ``dsir_score_ppm / n_bigrams`` (length-normalized) downstream.

    Scale shape: one bigram explode; the feature-count tables collapse
    to ≤ ``n_buckets`` rows each (hashed features, map-side combine) so
    the ratio table is a guaranteed BROADCAST join against the bigram
    stream; then one per-doc agg. At 100 TB the only heavy exchange is
    the per-doc aggregation — keyed on the same id the scan is already
    bucketed by.
    """
    tk = tokens(text_col)
    bg = df.select(
        F.col(id_col).alias("_id"),
        F.col(target_col).alias("_tgt"),
        F.explode(
            F.zip_with(
                F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
                F.slice(tk, 2, F.greatest(F.size(tk) - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bgm"),
    ).withColumn(
        "f",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit("dsir0:"), F.col("bgm"))), 1, 4),
                16,
                10,
            ).cast("long"),
            F.lit(n_buckets),
        ),
    )
    raw = bg.groupBy("f").agg(F.count(F.lit(1)).alias("r_cnt"))
    tgt = (
        bg.filter(F.col("_tgt"))
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("t_cnt"))
    )
    ratios = (
        raw.join(tgt, "f", "left")
        .na.fill({"t_cnt": 0})
        .select(
            "f",
            F.expr(
                f"(t_cnt + 1) * CAST({scale} AS BIGINT) div (r_cnt + 1)"
            ).alias("ratio_scaled"),
        )
    )
    scored = (
        bg.join(F.broadcast(ratios), "f")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("ratio_scaled").cast("long").alias("dsir_score_ppm"),
        )
    )
    base = df.select(F.col(id_col).alias("_id")).distinct()
    return (
        base.join(scored, "_id", "left")
        .na.fill({"n_bigrams": 0, "dsir_score_ppm": 0})
        .select(
            F.col("_id").alias(id_col),
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.col("dsir_score_ppm").cast("long").alias("dsir_score_ppm"),
        )
    )


def unigram_rarity_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    head_max: int = 2_000,
    middle_max: int = 20_000,
) -> DataFrame:
    """CCNet-style head/middle/tail corpus partitioning by language-model
    score (Wenzek et al. 2019, public) — with the corpus's OWN unigram
    model standing in for the external KenLM (no model files in this
    environment, and a self-unigram score ranks the same degenerate
    docs a 5-gram LM would flag). Log-free and integer-exact per the
    repo float policy: a token's rarity is ``total_tokens // count``
    (inverse probability, floored), a document's score is the floored
    mean token rarity — common-word docs score low (head), rare-junk
    docs score high (tail).

    Scale shape: one explode over tokens, a vocab-sized hash-agg with
    map-side combine, a 1-row total broadcast, then a shuffle join of
    the exploded tokens to the rarity table on the token key (vocab is
    too big to broadcast at 100 TB — the join co-partitions on token),
    and a final per-doc agg; per-token rarity is capped (see inline
    note) so the BIGINT doc sums cannot overflow at any corpus size.
    """
    tok = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.filter(tokens(F.col(text_col)), lambda t: F.length(t) > 0)
        ).alias("w"),
    ).select("_id", F.lower("w").alias("w"))
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("long").alias("total"))
    # rarity capped at 2^31: a hapax's raw rarity equals total_tokens,
    # and 1e7 rare tokens × 1e12-token-corpus rarity would overflow the
    # BIGINT doc sum (Spark wraps silently, DuckDB promotes to HUGEINT —
    # silent cross-engine divergence). The cap keeps sum_rarity ≤
    # n_tokens·2^31 < 2^63 for any doc under 4G tokens, and a ≥2^31×
    # rarity is already "maximally rare" for bucketing purposes.
    rarity = vocab.crossJoin(F.broadcast(total)).select(
        "w",
        F.least(F.expr("total div cnt"), F.lit(2**31))
        .cast("long")
        .alias("rarity"),
    )
    scored = (
        tok.join(rarity, "w")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("rarity").cast("long").alias("sum_rarity"),
        )
        .select(
            "_id",
            "n_tokens",
            F.expr("sum_rarity div n_tokens").cast("long").alias("rarity_score"),
        )
    )
    base = df.select(F.col(id_col).alias("_id"))
    return (
        base.join(scored, "_id", "left")
        .na.fill({"n_tokens": 0, "rarity_score": 0})
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            "rarity_score",
            F.when(F.col("rarity_score") < head_max, "head")
            .when(F.col("rarity_score") < middle_max, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-export shard manifest: every document is assigned to one
    of ``n_shards`` output shards by a content-independent md5 of its id
    (stable under re-partitioning and re-runs — the property a resumable
    exporter needs), and the manifest row per shard carries the counts a
    loader checks before training: docs, whitespace tokens, characters,
    id range.

    Scale shape: the shard id is a narrow expression; ONE hash-agg on
    the (bounded, small) shard key with map-side combine — the manifest
    is n_shards rows no matter the corpus size.

    Id-range columns: for integral id columns ``min_id``/``max_id`` are
    longs; for string/other ids (UUIDs, URLs — the md5 shard assignment
    handles them fine) the range is reported in the ID'S OWN TYPE
    (r13 review: the unconditional long cast crashed under ANSI with
    CAST_INVALID_INPUT, or silently nulled the range with ANSI off).
    """
    from pyspark.sql import types as T

    shard = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10
        ).cast("long")
        % n_shards
    ).cast("int")
    integral_id = isinstance(
        df.schema[id_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )
    min_id = F.min("_id")
    max_id = F.max("_id")
    if integral_id:
        min_id, max_id = min_id.cast("long"), max_id.cast("long")
    return (
        df.select(
            shard.alias("shard"),
            F.col(id_col).alias("_id"),
            token_count(F.col(text_col)).alias("_ntok"),
            F.length(F.col(text_col)).alias("_nchr"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_ntok").cast("long").alias("n_tokens"),
            F.sum("_nchr").cast("long").alias("n_chars"),
            min_id.alias("min_id"),
            max_id.alias("max_id"),
        )
    )


def bpe_pair_counts(
    df: DataFrame,
    k: int = 20,
    text_col: str = "text",
    end_marker: str = "</w>",
) -> DataFrame:
    """First iteration of BPE tokenizer training (Sennrich et al. 2016,
    public): count adjacent character pairs across the word vocabulary,
    weighted by word frequency, with the end-of-word marker pair
    included — the statistic whose argmax becomes the first merge rule.
    Returns the top-``k`` pairs by weighted count (ties → pair asc).

    Scale shape: the WORD VOCABULARY aggregates first (one token
    shuffle with map-side combine — at corpus scale the vocab is
    orders of magnitude smaller than the token stream), then pairs
    explode from the vocab only, and a second hash-agg on the pair key
    (alphabet², tiny) produces the counts. Full BPE iterates: apply the
    merge to the vocab (a narrow regexp per word) and re-run — each
    round costs one vocab-sized pass, never a corpus rescan.
    """
    vocab = (
        df.select(
            F.explode(
                F.filter(tokens(F.col(text_col)), lambda t: F.length(t) > 0)
            ).alias("w")
        )
        .select(F.lower("w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # adjacent-pair grams: substr(w, i, 2) for i in 1..len-1 (guarded to
    # a 1-element range for 1-char words; the `when` below discards it)
    inner = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("w") - 1, F.lit(1))),
        lambda i: F.col("w").substr(i, F.lit(2)),
    )
    pairs = vocab.select(
        "freq",
        F.explode(
            F.concat(
                F.when(F.length("w") > 1, inner).otherwise(
                    F.array().cast("array<string>")
                ),
                F.array(
                    F.concat(
                        F.col("w").substr(F.length("w"), F.lit(1)),
                        F.lit(end_marker),
                    )
                ),
            )
        ).alias("pair"),
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("freq").cast("long").alias("weighted_count")
    )
    w = Window.orderBy(F.col("weighted_count").desc(), F.col("pair").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("pair", "weighted_count", F.col("rank").cast("int"))
    )
