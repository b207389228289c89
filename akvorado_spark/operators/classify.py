"""Exporter/interface classifiers and per-exporter rate limiting
(SURVEY §2.9 T1/T3; reference outlet/core/classifier.go,
outlet/core/enricher.go:279-387, outlet/core/rate.go:28-70).

Classifiers
-----------
The reference runs user-supplied expr-lang snippets per flow in rule
order; each attribute keeps the **first** value any rule assigns
(first-match-wins per attribute), and a rule may Reject the flow.
Spark-first re-expression: each rule's condition is a restricted SQL
boolean over the exporter/interface columns, and every attribute
compiles to one ``coalesce(when(c1, v1), when(c2, v2), …, default)``
column — the whole cascade stays inside whole-stage codegen, no UDF,
no shuffle.  Rejection compiles to a ``filter``.

Batch semantics note: the reference stops evaluating once every
attribute is set, so a *later* reject rule may be skipped for a flow
whose attributes were all classified earlier.  Here rejection is the
OR of all reject-rule conditions — evaluation-order-free, which is
the natural batch reading and matches any config whose reject rules
precede classification rules (the common layout).

Rate limiting
-------------
The reference's per-exporter token bucket drops flows above
``limit``/s at 200 ms resolution and inflates the SamplingRate of
survivors by the observed drop rate so aggregates stay unbiased.
Batch re-expression over a closed window of rows: within each
(exporter, 200 ms tick), keep the first ``limit/5`` rows in time
order and scale survivors' SamplingRate by total/kept — exactly
unbiased within the tick (the reference applies the *previous*
second's drop rate, an online approximation of the same quantity).
One window shuffle on (exporter, tick); at 100 TB the tick keys are
fine-grained enough that skew is bounded by per-exporter ingest rate.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ClassifierRule:
    """One rule: when ``when`` holds, assign ``sets`` (attr → SQL
    string expression) and/or reject the flow."""

    when: str
    sets: dict[str, str] = field(default_factory=dict)
    reject: bool = False


def normalize_sql(expr_sql: str) -> str:
    """The reference's classifier-output normalization
    (outlet/core/classifier.go:266-271): lowercase, then strip every
    character outside ``[a-z0-9.+-]``.  Applied by every
    ``ClassifyX``/``ClassifyXRegex`` function — ``ClassifyProvider
    ("Othello")`` stores ``othello``, a ``"P$1"`` template expanding
    to ``P100`` stores ``p100`` (enricher_test.go:468-504).  NULL
    rides through, so a non-matching regex still skips the rule."""
    return f"regexp_replace(lower({expr_sql}), '[^a-z0-9.+-]+', '')"


def classify_str_sql(expr_sql: str) -> str:
    """``ClassifyX(string)`` parity: the value, normalized
    (outlet/core/classifier.go:273-279).  ``SetName``/``SetDescription``
    interface renames do NOT normalize (enricher_test.go:295-325) —
    use the raw expression for those."""
    return normalize_sql(expr_sql)


def classify_regex_norm_sql(subject_sql: str, pattern: str, template: str) -> str:
    """``ClassifyXRegex(subject, pattern, template)`` parity: template
    expansion via :func:`classify_regex_sql`, then output
    normalization (outlet/core/classifier.go:281-309).  A non-matching
    subject yields NULL — the cascade's coalesce falls through to the
    next rule, mirroring the reference's ``return false`` which also
    short-circuits the rule's remaining ``&&`` chain; when translating
    a reference rule where further Classify calls FOLLOW the regex,
    condition those attributes' ``when`` on the same RLIKE."""
    return normalize_sql(classify_regex_sql(subject_sql, pattern, template))


def classify_regex_sql(subject_sql: str, pattern: str, template: str) -> str:
    """SQL equivalent of the reference's ``ClassifyRegex(subject,
    pattern, template)`` (outlet/core/classifier.go): when the subject
    matches, the RESULT IS THE TEMPLATE with ``$N`` capture-group
    substitutions (not a substitution inside the subject); a
    non-matching subject classifies nothing (NULL → the cascade's
    coalesce skips this rule).

    Rendered as a single regexp_replace rewriting the WHOLE subject to
    the template: ``(?s)^.*?(<pattern>).*$`` anchors a lazy prefix
    before the leftmost match and swallows the rest, so the pattern is
    matched IN CONTEXT — context assertions (lookahead/lookbehind)
    keep seeing the full subject, unlike an extract-then-replace
    two-step that would re-match the pattern against just the
    extracted text.  The wrapper captures the user's match as group 1,
    so ``$0``/``$N`` template references and ``\\N`` pattern backrefs
    are renumbered up by one at build time.  Stays inside codegen like
    the rest of the cascade.
    """
    import re as _re

    shifted_pattern = _re.sub(
        r"(?<!\\)\\(\d+)", lambda m: "\\" + str(int(m.group(1)) + 1), pattern
    )
    def _shift_ref(m: "_re.Match[str]") -> str:
        # Renumber $N / ${N} group references up by one; any OTHER `$`
        # (bare `$`, `$ rate`, `${name}`) is escaped to a literal so it
        # never reaches Java's replacement parser as a malformed group
        # reference (which would throw at query runtime).
        if m.group(1) is not None:
            return "$" + str(int(m.group(1)) + 1)
        if m.group(2) is not None:
            # Spark's replacement parser resolves braced refs (even
            # numeric `${1}`) to empty — emit unbraced; the parser only
            # consumes following digits while they still name a real
            # group, so `${1}0` → `$20` still reads as group-2 then "0"
            # unless the pattern really has that many groups
            return "$" + str(int(m.group(2)) + 1)
        if m.group(3) is not None:
            # `${name}`: Spark treats ANY `${...}` as an (empty) group
            # reference, even after `\$` — the brace needs escaping too
            return "\\$\\{"
        return "\\$"

    shifted_template = _re.sub(
        r"(?<!\\)\$(?:(\d+)|\{(\d+)\}|(\{)?)", _shift_ref, template
    )
    p = pattern.replace("\\", "\\\\").replace("'", "\\'")
    sp = shifted_pattern.replace("\\", "\\\\").replace("'", "\\'")
    t = shifted_template.replace("\\", "\\\\").replace("'", "\\'")
    return (
        f"CASE WHEN {subject_sql} RLIKE '{p}' THEN "
        f"regexp_replace({subject_sql}, '(?s)^.*?({sp}).*$', '{t}') END"
    )


def classify(
    df: DataFrame,
    rules: list[ClassifierRule],
    defaults: dict[str, str] | None = None,
) -> DataFrame:
    """Apply a classifier cascade.

    ``defaults`` maps attributes to a fallback SQL expression used when
    no rule matches (the reference falls back to the metadata-provided
    value, e.g. ``Name = ii.Name``).
    """
    attrs: list[str] = []
    for r in rules:
        for a in r.sets:
            if a not in attrs:
                attrs.append(a)
    for a in defaults or {}:
        if a not in attrs:
            attrs.append(a)

    # NULL-safe reject: a condition evaluating to NULL (e.g. a NULL
    # column) must KEEP the flow — ~NULL is NULL and filter(NULL)
    # would silently drop it, inverting keep-unless-rejected
    reject_conds = [
        F.coalesce(F.expr(r.when), F.lit(False)) for r in rules if r.reject
    ]
    if reject_conds:
        keep = ~reject_conds[0]
        for c in reject_conds[1:]:
            keep = keep & ~c
        df = df.filter(keep)

    # Two-phase assignment: every rule condition AND value expression
    # evaluates against the ORIGINAL flow (the reference classifies
    # from the unmutated input) — computing into temporary columns
    # first means a rule that sets a column other rules condition on
    # cannot poison later attributes.
    for a in attrs:
        branches = [
            F.when(F.expr(r.when), F.expr(r.sets[a])) for r in rules if a in r.sets
        ]
        fallback = (defaults or {}).get(a)
        if fallback is not None:
            branches.append(F.expr(fallback))
        df = df.withColumn(
            f"__cls_{a}", F.coalesce(*branches) if branches else F.lit(None)
        )
    for a in attrs:
        df = df.drop(a).withColumnRenamed(f"__cls_{a}", a)
    return df


def rate_limit(
    df: DataFrame,
    limit_per_s,
    key: str = "ExporterAddress",
    time_col: str = "TimeReceived",
    tiebreak: tuple[str, ...] = (),
    sampling_col: str = "SamplingRate",
) -> DataFrame:
    """Per-exporter rate limit with sampling-rate compensation (T1).

    Keeps at most ``limit_per_s / 5`` flows per (exporter, 200 ms
    tick), in (time, tiebreak) order, and rescales survivors'
    sampling rate by total/kept (floor) so SUM(x*SamplingRate)
    aggregates stay unbiased within the tick.

    ``limit_per_s`` may be an int (one limit for every key) or a
    column/column-name carrying the limit PER ROW — the RawFlow
    transport form, where each message brings its exporter's limit
    (common/pb/rawflow.proto field 8; outlet/core/worker.go:71 applies
    ``rawFlow.RateLimit`` per message).  A zero or NULL per-row limit
    means no limit, matching the proto's "0 means no limit".  The limit
    is expected constant within one (key, tick) group, as it is on the
    wire (one exporter → one configured rate).

    Granularity floor: ``limit_per_s < 5`` still passes one flow per
    tick (up to 5/s) — the 200 ms resolution cannot express a lower
    rate, matching the reference's per-tick bucket floor.
    """
    d = rate_limit_annotate(df, key=key, time_col=time_col, tiebreak=tiebreak)
    return apply_rate_limit(d, limit_per_s, sampling_col=sampling_col)


def rate_limit_annotate(
    df: DataFrame,
    key: str = "ExporterAddress",
    time_col: str = "TimeReceived",
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """The shuffle half of :func:`rate_limit`: per-(key, 200 ms tick)
    arrival rank ``__rn`` and population ``__total``.

    Split out so several limit POLICIES (a global limit, the per-row
    RawFlow limit, an experiment's candidate limit) can share ONE
    window shuffle+sort over the same keying — the annotation is
    policy-independent; :func:`apply_rate_limit` is a narrow
    filter+projection per policy.  Same partitioning AND ordering for
    both analytics (the count just widens the frame to the whole
    partition) → Catalyst evaluates them in one Window operator over
    one exchange."""
    tick = (F.unix_millis(F.col(time_col).cast("timestamp")) / 200).cast("long")
    d = df.withColumn("__tick", tick)
    w = Window.partitionBy(key, "__tick").orderBy(
        F.col(time_col).asc(), *[F.col(t).asc() for t in tiebreak]
    )
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return d.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__total", F.count(F.lit(1)).over(wall)
    )


def apply_rate_limit(
    annotated: DataFrame,
    limit_per_s,
    sampling_col: str = "SamplingRate",
) -> DataFrame:
    """Apply one limit policy to a :func:`rate_limit_annotate` frame:
    keep rank ≤ limit/5 per tick and rescale survivors' sampling rate
    by total/kept (floor) — a stateless narrow stage, no shuffle."""
    if isinstance(limit_per_s, int):
        unlimited = F.lit(False)
        per_tick = F.lit(max(limit_per_s // 5, 1))
    else:
        lim = F.col(limit_per_s) if isinstance(limit_per_s, str) else limit_per_s
        unlimited = lim.isNull() | (lim <= 0)
        per_tick = F.greatest(F.floor(lim / 5).cast("long"), F.lit(1))
    d = annotated.filter(unlimited | (F.col("__rn") <= per_tick))
    kept = F.least(F.col("__total"), per_tick)
    d = d.withColumn(
        sampling_col,
        F.when(unlimited, F.col(sampling_col)).otherwise(
            F.floor((F.col(sampling_col) * F.col("__total")) / kept).cast("long")
        ),
    )
    return d.drop("__tick", "__rn", "__total")


def rate_limit_token_bucket(
    df: DataFrame,
    limit_per_s: int,
    key: str = "ExporterAddress",
    time_col: str = "TimeReceived",
    tiebreak: tuple[str, ...] = (),
    sampling_col: str = "SamplingRate",
) -> DataFrame:
    """Reference-exact token-bucket rate limit (T1; rate.go:37-63,
    worker.go:71-100, pinned by rate_test.go's burst/steady/drop-rate
    numbers).

    Semantics mirrored from golang.org/x/time/rate as the reference
    configures it: refill ``limit_per_s`` tokens/s, burst
    ``limit_per_s // 10`` (so a limit below 10/s admits nothing —
    use :func:`rate_limit` for a graceful per-tick floor), a denied
    flow does not consume or commit state, and survivors' sampling
    rate is inflated by ``1/(1-dropRate)`` where dropRate is the
    drop fraction of the *previous* 200 ms tick (truncating to
    uint64, worker.go:97-100).  Two benign divergences from the Go
    code, both documented here: the first-ever event cannot observe
    the 0/0 NaN drop rate (we keep 0.0 — Go's ``NaN > 0`` is false
    so compensation is identically skipped), and a previous tick
    that dropped 100% leaves the sampling rate unchanged instead of
    converting +Inf.

    The scan is inherently sequential per exporter — the same serial
    dependency the reference's mutex-per-exporter imposes — so this
    runs as one ``applyInPandas`` over a single (key) shuffle; the
    deterministic tick variant :func:`rate_limit` remains the
    whole-stage-codegen production path.
    """
    burst = limit_per_s // 10
    rate = float(limit_per_s)
    time_is_ts = dict(df.dtypes)[time_col].startswith("timestamp")
    t_ms = (
        F.unix_millis(F.col(time_col))
        if time_is_ts
        else (F.col(time_col).cast("double") * 1000).cast("long")
    )
    d = df.withColumn("__t_ms", t_ms)
    schema = d.schema
    sort_cols = ["__t_ms", *tiebreak]

    def _bucket(pdf):
        import numpy as np

        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        t = pdf["__t_ms"].to_numpy(dtype="float64") / 1000.0
        n = len(pdf)
        keep = np.zeros(n, dtype=bool)
        comp = np.ones(n, dtype="float64")
        tokens, last = float(burst), t[0] if n else 0.0
        cur_tick, dropped, total, drop_rate = None, 0, 0, 0.0
        for i in range(n):
            now = t[i]
            tick = int(now * 5)  # 200 ms resolution (rate.go:39)
            if cur_tick is None:
                cur_tick = tick
            elif tick != cur_tick:
                drop_rate = dropped / total if total else 0.0
                dropped = total = 0
                cur_tick = tick
            total += 1
            avail = min(float(burst), tokens + rate * (now - last))
            if avail >= 1.0:
                tokens, last = avail - 1.0, now
                keep[i] = True
                if 0.0 < drop_rate < 1.0:
                    comp[i] = 1.0 / (1.0 - drop_rate)
            else:
                dropped += 1
        pdf = pdf.assign(
            **{sampling_col: np.floor(pdf[sampling_col].to_numpy() * comp).astype("int64")}
        )
        return pdf[keep]

    return d.groupBy(key).applyInPandas(_bucket, schema).drop("__t_ms")
