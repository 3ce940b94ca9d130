"""Stage 2 — triple extraction: mention detection over file content.

Two interchangeable engines with byte-identical output (a pytest
asserts equality on the fixture corpus):

  * ``engine="native"`` (default): pure JVM ``regexp_extract_all`` +
    higher-order array functions — stays inside whole-stage codegen,
    zero Python on the datapath. This is the 100 TB fast path.
  * ``engine="pandas"``: the Arrow-vectorized pandas-UDF extractor the
    north_star describes ("batched regex + tree-sitter-style mention
    detection"); the slot where a real tree-sitter parse would plug in
    on a cluster with native libs available.

Both are pure per-row functions of (lang, content) — no cross-row
state — so Arrow batch boundaries and partitioning cannot change the
output (SURVEY.md §7.4 determinism requirement).

The reference's only extraction analogue is expression-level
projection of already-structured rows (graph-transformation.py:77-116);
regex appears only as a validation predicate
(ecommerce-etl-pipeline.py:154). We generalize that `rlike` idea into
`regexp_extract_all` mention detectors per language.

Emitted predicates (north_star):
    (repo/path, WRITTEN_IN, lang)    — projection, no parsing
    (repo,      DECLARES,   symbol)  — def/class/function/table decls
    (repo/path, IMPORTS,    module)  — import/require/from statements
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Identifier char classes written with explicit unicode ranges so the
# JVM regex engine (ASCII \w) and Python's re (unicode \w) agree.
_ID0 = "[A-Za-z_\u00c0-\uffef]"
_IDC = "[A-Za-z0-9_\u00c0-\uffef]"
IDENT = f"{_ID0}{_IDC}*"
DOTTED = f"{IDENT}(?:\\.{IDENT})*"

# (lang, predicate, regex-with-one-capture-group). Shared verbatim by
# both engines; every construct used is portable between java.util.regex
# and Python re.
RULES: list[tuple[str, str, str]] = [
    ("python", "IMPORTS", rf"(?m)^import\s+({DOTTED})"),
    ("python", "IMPORTS", rf"(?m)^from\s+({DOTTED})\s+import"),
    ("python", "DECLARES", rf"(?m)^def\s+({IDENT})"),
    ("python", "DECLARES", rf"(?m)^class\s+({IDENT})"),
    # call-site detection (schemas.py CALLS predicate): a bare
    # `ident(` at line start — declaration keywords (def/class/
    # function/func) put a space before the name, so they never match
    ("python", "CALLS", rf"(?m)^({IDENT})\("),
    ("javascript", "IMPORTS", rf"(?m)^import\s+.*?\s+from\s+'([^']+)'"),
    ("javascript", "IMPORTS", r"require\('([^']+)'\)"),
    ("javascript", "DECLARES", rf"(?m)^function\s+({IDENT})"),
    ("javascript", "DECLARES", rf"(?m)^class\s+({IDENT})"),
    ("javascript", "CALLS", rf"(?m)^({IDENT})\("),
    ("java", "IMPORTS", rf"(?m)^import\s+({DOTTED})\.{IDENT}\s*;"),
    ("java", "DECLARES", rf"(?m)^(?:public\s+|final\s+)*class\s+({IDENT})"),
    ("go", "IMPORTS", r'(?m)^import\s+"([^"]+)"'),
    ("go", "DECLARES", rf"(?m)^func\s+({IDENT})"),
    ("go", "CALLS", rf"(?m)^({IDENT})\("),
    ("sql", "DECLARES", rf"(?mi)^CREATE\s+TABLE\s+({IDENT})"),
    ("sql", "IMPORTS", rf"(?i)\bFROM\s+({IDENT})"),
]

_LANGS = sorted({lang for lang, _, _ in RULES})


def _file_ref() -> F.Column:
    return F.concat_ws("/", F.col("repo"), F.col("path"))


def _extract_native(ingested: DataFrame) -> DataFrame:
    """JVM-only mention detection: regexp_extract_all per rule, arrays
    tagged with their predicate via transform(), concatenated, exploded.
    One narrow stage — no shuffle until the caller aggregates."""
    def tagger(pred: str):
        # single-arg lambda: a 2-arg lambda would be treated as
        # (element, index) by F.transform
        return lambda m: F.struct(F.lit(pred).alias("pred"), m.alias("obj"))

    # NULL content must behave like empty content: regexp_extract_all of
    # NULL is NULL, and concat-with-NULL nulls the whole mention array,
    # which would silently drop the WRITTEN_IN triple the pandas engine
    # still emits (engine-equivalence bug found in round-1 review)
    content = F.coalesce(F.col("content"), F.lit(""))
    per_lang = []
    for lang in _LANGS:
        arrays = [
            F.transform(
                F.regexp_extract_all(content, F.lit(pattern), F.lit(1)),
                tagger(pred),
            )
            for rule_lang, pred, pattern in RULES
            if rule_lang == lang
        ]
        per_lang.append((lang, F.concat(*arrays) if len(arrays) > 1 else arrays[0]))

    mentions = F.when(F.col("lang") == per_lang[0][0], per_lang[0][1])
    for lang, arr in per_lang[1:]:
        mentions = mentions.when(F.col("lang") == lang, arr)
    mentions = mentions.otherwise(F.array().cast("array<struct<pred:string,obj:string>>"))
    # fold the WRITTEN_IN projection into the same array: one explode,
    # one corpus scan (a unioned projection branch would re-scan the
    # whole corpus a second time — union branches share nothing)
    mentions = F.concat(
        F.array(F.struct(F.lit("WRITTEN_IN").alias("pred"), F.col("lang").alias("obj"))),
        mentions,
    )

    exploded = (
        ingested.select(
            "repo", "lang", "content_sha", _file_ref().alias("file_ref"),
            F.explode(mentions).alias("m"),
        )
    )
    return exploded.select(
        F.when(F.col("m.pred") == "DECLARES", F.col("repo"))
        .otherwise(F.col("file_ref"))
        .alias("subj"),
        F.col("m.pred").alias("pred"),
        F.col("m.obj").alias("obj"),
        F.col("content_sha").alias("src_sha"),
        "repo",
        "lang",
    )


_COMPILED: dict[str, list[tuple[str, re.Pattern]]] = {}


def _compiled_rules(lang: str) -> list[tuple[str, re.Pattern]]:
    if lang not in _COMPILED:
        _COMPILED[lang] = [
            (pred, re.compile(pattern))
            for rule_lang, pred, pattern in RULES
            if rule_lang == lang
        ]
    return _COMPILED.get(lang, [])


def _extract_pandas(ingested: DataFrame) -> DataFrame:
    """Arrow-vectorized twin of _extract_native — the extension point
    for tree-sitter-style parsing. Pure per-row function of
    (lang, content); emits the same rows as the native engine."""

    def detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple[str, str, str, str, str, str]] = []
            for repo, lang, sha, file_ref, content in zip(
                pdf["repo"], pdf["lang"], pdf["content_sha"],
                pdf["file_ref"], pdf["content"],
            ):
                out.append((file_ref, "WRITTEN_IN", lang, sha, repo, lang))
                if not content:
                    continue
                for pred, rx in _compiled_rules(lang):
                    for obj in rx.findall(content):
                        subj = repo if pred == "DECLARES" else file_ref
                        out.append((subj, pred, obj, sha, repo, lang))
            yield pd.DataFrame(
                out, columns=["subj", "pred", "obj", "src_sha", "repo", "lang"]
            )

    narrowed = ingested.select(
        "repo", "lang", "content_sha", _file_ref().alias("file_ref"), "content"
    )
    return narrowed.mapInPandas(
        detect,
        schema="subj string, pred string, obj string, src_sha string, "
        "repo string, lang string",
    )


def extract(ingested: DataFrame, engine: str = "native") -> DataFrame:
    """ingested -> candidate triples (subj, pred, obj, src_sha, repo, lang).

    Match order within one (rule, row) is document order in both engines;
    duplicates are preserved here (frequency may matter to downstream
    scoring) — dedup happens at materialize (reference MERGE semantics,
    neo4j-loading.py:230-234).
    """
    if engine == "native":
        return _extract_native(ingested)
    if engine == "pandas":
        return _extract_pandas(ingested)
    raise ValueError(f"unknown extraction engine: {engine!r}")


def extract_with_manifest(
    source: DataFrame,
    manifest: DataFrame,
    engine: str = "native",
    broadcast: bool = True,
    buckets: int = 256,
    assume_unique: bool = False,
) -> DataFrame:
    """Extraction that PROPAGATES the ingest manifest's content_sha by
    file_id instead of recomputing it — hash once, join by key.

    The corpus payload is hashed exactly once (in the ingest-manifest
    pass); extraction carries the lock-free xxhash file_id through the
    sha slot and swaps the real sha back in with a join on the narrow
    manifest. Two join modes:

      * ``broadcast=True`` (default): manifest ships to every executor —
        right up to O(10^8) files, after which it exceeds driver memory;
      * ``broadcast=False``: both sides repartition on file_id and join
        shuffle-hash — the 10^12-file path SCALE.md §2 promises; the
        triples side shuffles once on a key it already carries, the
        manifest side is narrow (file_id, content_sha).

    The manifest MUST be unique per file_id: (repo, path, commit) is the
    contract key of the source table, and a duplicate entry would fan
    every triple out N times (and could attach the wrong sha). Enforced
    here with dropDuplicates rather than trusted — EXCEPT when the
    caller passes ``assume_unique=True``: the dedup shuffle of the
    narrow side sits on the broadcast-build critical path (the big scan
    cannot start until manifest scan -> exchange -> dedup -> collect
    completes) and measured 6-7 s of a fresh-JVM pipeline run at 200k
    files (round-7, guide §2.4: remove shuffles on already-unique
    data). The pipeline sets it: its manifest is the ingest stage's own
    output over a source whose contract key IS (repo, path, commit), so
    the dedup is a no-op there by construction.

    The invariant is unchanged: src_sha equals sha256(content) of the
    originating row (tests assert equality against an inline recompute).
    """
    keyed = source.select(
        "repo",
        "path",
        "commit",
        "lang",
        "content",
        F.concat(
            F.lpad(F.hex(F.xxhash64("repo", "path", "commit")), 16, "0"),
            F.lpad(F.hex(F.xxhash64("commit", "path", "repo")), 16, "0"),
        ).alias("content_sha"),  # file_id riding the sha slot until the join
    )
    trip = extract(keyed, engine=engine)
    narrow = manifest.select("file_id", "content_sha")
    if not assume_unique:
        narrow = narrow.dropDuplicates(["file_id"])
    trip = trip.withColumnRenamed("src_sha", "file_id")
    if broadcast:
        joined = trip.join(F.broadcast(narrow), "file_id")
    else:
        joined = (
            trip.repartition(buckets, "file_id")
            .join(narrow.repartition(buckets, "file_id").hint("shuffle_hash"), "file_id")
        )
    return joined.select(
        "subj",
        "pred",
        "obj",
        F.col("content_sha").alias("src_sha"),
        "repo",
        "lang",
    )
