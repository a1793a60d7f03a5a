"""Corpus ingestion: the source formats a training-data pipeline actually
receives documents in — JSONL (CommonCrawl-style dumps), CSV exports, and
directories of plain-text files — normalized to the canonical documents
schema (doc_id, text, ...) the datapipe ops consume.

Scale notes:
- JSONL/CSV scans are splittable (line-delimited), so a 100 TB dump
  parallelizes without any repacking; schema is supplied, never inferred
  (inference is a full extra pass over the data).
- Corrupt records are CAPTURED, not dropped: they land in a
  ``_corrupt_record`` column (PERMISSIVE mode) so a bad shard degrades to
  a quantified quality signal instead of a silent row loss; use
  ``split_corrupt`` to fork the clean and quarantine streams.
- Synthetic doc ids are CONTENT-DERIVED (xxhash64 of the text, salted) —
  stable across re-ingestion, repartitioning, and cluster size, unlike
  ``monotonically_increasing_id`` (partition-layout-dependent) or row
  numbers (a global sort). Exact duplicate texts share an id by design —
  they are the same document to every downstream dedup op; pass
  ``id_salt_cols`` to disambiguate by provenance (e.g. the file path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

DOC_SCHEMA = StructType([
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
])


def synth_doc_id(text, salt_cols: list = ()) -> "F.Column":
    """Content-derived 64-bit doc id: xxhash64 over the text plus any
    provenance columns — reproducible on any cluster, any day.

    ONE concatenated string (unit-separator-joined), not multi-arg
    ``xxhash64(a, b, ...)`` — the multi-arg form chains each column's
    hash as the next seed, which no external replayer reproduces; the
    concat form is plain XXH64(seed 42) of a string, which the DuckDB
    oracle CTE replays exactly."""
    parts = [F.lit("doc:"), text]
    for c in salt_cols:
        parts += [F.lit("\x1f"), c]
    return F.xxhash64(F.concat(*parts))


def read_jsonl_docs(spark: SparkSession, path: str,
                    schema: StructType | None = None,
                    id_salt_cols: tuple[str, ...] = ()) -> DataFrame:
    """Line-delimited JSON -> documents frame with captured corrupt rows.

    Returns (doc_id, text, <schema fields>, _corrupt_record); clean rows
    have ``_corrupt_record`` NULL."""
    # StructType.add MUTATES in place — never .add() onto the shared
    # module-level schema
    base = schema or DOC_SCHEMA
    sch = StructType(list(base.fields)
                     + [StructField("_corrupt_record", StringType())])
    df = (spark.read.schema(sch)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(path))
    salt = [F.col(c) for c in id_salt_cols]
    return df.withColumn(
        "doc_id",
        F.when(F.col("_corrupt_record").isNull(),
               synth_doc_id(F.coalesce(F.col("text"), F.lit("")), salt)))


def read_csv_docs(spark: SparkSession, path: str,
                  schema: StructType | None = None,
                  header: bool = True, sep: str = ",") -> DataFrame:
    """CSV export -> documents frame, corrupt rows captured like JSONL."""
    base = schema or DOC_SCHEMA
    sch = StructType(list(base.fields)
                     + [StructField("_corrupt_record", StringType())])
    df = (spark.read.schema(sch)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .option("header", str(header).lower())
          .option("sep", sep)
          .option("multiLine", "false")
          .csv(path))
    return df.withColumn(
        "doc_id",
        F.when(F.col("_corrupt_record").isNull(),
               synth_doc_id(F.coalesce(F.col("text"), F.lit("")))))


def read_text_dir_docs(spark: SparkSession, path: str,
                       glob: str = "*.txt") -> DataFrame:
    """One document per FILE from a directory of plain-text files:
    (doc_id, text, source=file path). ``wholetext`` keeps each file one
    row (files are the natural document boundary here); the file path
    salts the id so identical texts in different files stay distinct."""
    df = (spark.read.option("wholetext", "true")
          .option("pathGlobFilter", glob)
          .text(path)
          .select(F.col("value").alias("text"),
                  F.input_file_name().alias("source")))
    return df.withColumn("doc_id",
                         synth_doc_id(F.col("text"), [F.col("source")]))


def read_orc_docs(spark: SparkSession, path: str,
                  id_salt_cols: tuple[str, ...] = ()) -> DataFrame:
    """ORC export -> documents frame (the Hive-era columnar sibling of
    Parquet; Spark reads it natively with the same predicate-pushdown /
    column-pruning machinery, so downstream plans are identical to the
    Parquet lake's).  ORC is self-describing columnar — there are no
    per-row parse failures to quarantine, so unlike the JSONL/CSV
    paths there is no ``_corrupt_record`` column; a doc_id is
    synthesized for rows missing one, keyed on the text like the other
    ingest paths."""
    df = spark.read.orc(path)
    salt = [F.col(c) for c in id_salt_cols]
    if "doc_id" in df.columns:
        return df.withColumn(
            "doc_id",
            F.coalesce(F.col("doc_id"),
                       synth_doc_id(F.coalesce(F.col("text"), F.lit("")),
                                    salt)))
    return df.withColumn(
        "doc_id",
        synth_doc_id(F.coalesce(F.col("text"), F.lit("")), salt))


def write_bucketed(df: DataFrame, table: str, key: str = "doc_id",
                   n_buckets: int = 64,
                   sort: bool = True) -> None:
    """Persist a corpus as a BUCKETED table: rows are hash-partitioned
    into ``n_buckets`` files by ``key`` at write time (and sorted
    within buckets), so every later equi-join or aggregation on that
    key is ALREADY co-partitioned — Catalyst elides the exchange
    entirely (plan-pinned: a bucketed self-join has ZERO Exchange
    operators, and with sorted buckets no Sort either).

    This is the shuffle-elimination lever for the recurring joins of a
    100 TB pipeline (docs x quality scores, docs x dedup verdicts,
    docs x token counts ... all keyed on doc_id): pay ONE shuffle at
    ingest, never again.  Partitioned layouts (`write_band_index` et
    al.) prune SCANS; bucketing removes JOIN shuffles — complementary,
    composable.

    Uses the session catalog (`saveAsTable`) because bucket metadata
    lives in the table catalog, not in the files — path-based
    `spark.read.parquet` of the same files would NOT get the
    co-partitioning guarantee.
    """
    w = df.write.mode("overwrite").format("parquet") \
        .bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): fork on the captured corrupt column. The
    quarantine side keeps the raw record for forensics; the clean side
    drops the column so downstream schemas stay tidy."""
    never = F.length("text") < 0  # always false/null: see comment below
    clean = (df.where(F.col("_corrupt_record").isNull() | never)
             .drop("_corrupt_record"))
    # Spark refuses plans whose only referenced column is the internal
    # corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    # RECORD_COLUMN), and column pruning strips everything a count()
    # doesn't need — so the filter itself must reference a data column.
    # `length(text) < 0` is never true and forces `text` into the scan,
    # keeping the plan legal without caching the parse (the error
    # message's suggested workaround, which would be wrong at lake
    # scale).  The raw record is kept for forensics.
    bad = (df.where(F.col("_corrupt_record").isNotNull() | never)
           .select(F.col("_corrupt_record").alias("raw_record"),
                   "text"))
    return clean, bad


def compact_lake(spark: SparkSession, src: str, dst: str,
                 target_bytes: int = 128 << 20,
                 partition_cols: tuple[str, ...] = ()) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_bytes`` — the maintenance pass every long-lived ingest lake
    needs (thousands of tiny files turn scan planning and shuffle reads
    into metadata storms; the NameNode/listing cost alone kills 100 TB
    lakes).  Returns the output file count.

    Sizing comes from the Catalyst size estimate of the source scan (no
    data pass), and the rewrite is one repartition: with
    ``partition_cols`` the repartition keys on them so each output
    partition directory is written by few tasks (fewer, bigger files per
    partition)."""
    df = spark.read.parquet(src)
    from carbonapi_spark.datapipe import _plan_size_bytes
    est = _plan_size_bytes(df) or 0
    n = max(1, est // target_bytes)
    if partition_cols:
        out = df.repartition(int(n), *[F.col(c) for c in partition_cols])
        out.write.mode("overwrite").partitionBy(*partition_cols) \
            .parquet(dst)
    else:
        df.repartition(int(n)).write.mode("overwrite").parquet(dst)
    return _count_parquet_files(spark, dst)


def _count_parquet_files(spark: SparkSession, path: str) -> int:
    """Recursive *.parquet file count through the Hadoop FileSystem API,
    so it is correct on HDFS/S3/any configured scheme — a local
    ``glob.glob`` returns 0 exactly where a 100 TB lake lives."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    n = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            n += 1
    return n


def compact_index(spark: SparkSession, path: str,
                  target_bytes: int = 128 << 20) -> int:
    """In-place small-file compaction for the durable index artifacts
    (``write_ann_index``'s ``codes/cell=N/`` or ``write_text_index``'s
    ``postings/bucket=N/``): every ``append_*_index`` adds task-count
    files INSIDE the partition directories, so a long-lived index decays
    into a metadata storm exactly like an ingest lake.  Rewrites the
    partitioned sub-lake through :func:`compact_lake` PRESERVING the
    partition column (probe-time pruning untouched), then swaps the
    rewrite in with two FileSystem renames.  Returns the new file count.

    The swap is rename-based: atomic on HDFS/local, copy-backed on
    object stores — run it from the maintenance job that owns the
    index, like any FAISS/Lucene merge."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    for sub, pcol in (("codes", "cell"), ("postings", "bucket")):
        if fs.exists(jvm.org.apache.hadoop.fs.Path(f"{path}/{sub}")):
            break
    else:
        raise ValueError(f"{path} has neither codes/ nor postings/ — "
                         "not a durable index layout")
    src = f"{path}/{sub}"
    tmp, old = f"{src}__compacting", f"{src}__old"
    n = compact_lake(spark, src, tmp, target_bytes, (pcol,))
    p_src = jvm.org.apache.hadoop.fs.Path(src)
    p_tmp = jvm.org.apache.hadoop.fs.Path(tmp)
    p_old = jvm.org.apache.hadoop.fs.Path(old)
    fs.delete(p_old, True)
    if not fs.rename(p_src, p_old):
        raise IOError(f"compact_index swap failed for {src}: could not "
                      f"stage the live directory aside")
    if not fs.rename(p_tmp, p_src):
        # the live directory is already at __old and nothing is at src:
        # roll the original back before failing so probes keep working
        # (without this, a failed second rename leaves the index headless
        # until manual repair)
        restored = fs.rename(p_old, p_src)
        raise IOError(
            f"compact_index swap failed for {src}: rewrite rename "
            f"failed; original "
            f"{'restored' if restored else f'LEFT AT {old}'}")
    fs.delete(p_old, True)
    return n


def corpus_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                content_cols: tuple[str, ...] = ("text",)) -> DataFrame:
    """Snapshot diff between two corpus versions: per id, status
    ``added`` / ``removed`` / ``modified`` / ``unchanged`` — the audit
    a lake needs before re-running downstream dedup/mix stages on a
    refreshed crawl (and the input to incremental variants like
    ``minhash_incremental``, which want exactly the added+modified
    slice).

    ONE full outer join on the id; content equality compares a single
    xxhash64 over ``content_cols``, so wide rows ride the shuffle as
    (id, 8 bytes) — at 100 TB the diff costs two projections and one
    id-keyed exchange, never a byte-wise row comparison across the
    wire.  (Cross-version hash collisions would misreport a
    modification as unchanged; at 2^-64 per candidate pair that is
    below any operational concern.)  Returns (id, status)."""
    oh = old.select(F.col(id_col),
                    F.xxhash64(*[F.col(c) for c in content_cols])
                    .alias("__ho"))
    nh = new.select(F.col(id_col),
                    F.xxhash64(*[F.col(c) for c in content_cols])
                    .alias("__hn"))
    j = oh.join(nh, id_col, "full")
    status = (F.when(F.col("__ho").isNull(), F.lit("added"))
              .when(F.col("__hn").isNull(), F.lit("removed"))
              .when(F.col("__ho") == F.col("__hn"), F.lit("unchanged"))
              .otherwise(F.lit("modified")))
    return j.select(id_col, status.alias("status"))


def zorder_write(df: DataFrame, path: str, cols: tuple[str, ...],
                 bits: int = 16, n_files: int = 64,
                 mode: str = "overwrite") -> None:
    """Write ``df`` as parquet clustered on the Morton (Z-order)
    interleaving of ``cols`` — the multi-column layout trick: rows
    close in EVERY clustered dimension land in the same files, so
    parquet min/max stats prune multi-predicate scans that a
    single-column sort can only prune on its leading key.

    Each column is first normalized to a ``bits``-bit integer rank by
    linear min/max scaling (one tiny agg; ranks only steer placement,
    so skew in the scale costs clustering quality, never correctness),
    then the bit-interleaved key feeds ``repartitionByRange`` — a
    sample-based range exchange, NOT a global sort — into ``n_files``
    output files.

    At 100 TB this is a one-exchange rewrite whose value compounds:
    every later scan with predicates on any prefix-free subset of
    ``cols`` reads a ~(selectivity)^(1/len(cols)) fraction of files
    instead of all of them.  Readers need no cooperation — the layout
    is invisible to query semantics."""
    stats = df.agg(*[f(c).alias(f"__{n}_{c}")
                     for c in cols
                     for n, f in (("mn", F.min), ("mx", F.max))]) \
        .collect()[0]
    if any(stats[f"__mn_{c}"] is None for c in cols):
        # empty input (or an all-null cluster column): nothing to
        # cluster — write as-is rather than divide by a null span
        df.write.mode(mode).parquet(path)
        return
    z = F.lit(0).cast("long")
    scaled = []
    for c in cols:
        mn, mx = stats[f"__mn_{c}"], stats[f"__mx_{c}"]
        span = (mx - mn) or 1
        r = ((F.col(c) - F.lit(mn)) * ((1 << bits) - 1) / F.lit(span)) \
            .cast("long")
        scaled.append(F.greatest(F.lit(0),
                                 F.least(r, F.lit((1 << bits) - 1))))
    for b in range(bits):           # interleave bit b of every column
        for i, r in enumerate(scaled):
            z = z + (F.shiftright(r, b).bitwiseAND(F.lit(1))
                     .cast("long") * F.lit(1 << (b * len(scaled) + i)))
    (df.withColumn("__z", z)
     .repartitionByRange(n_files, "__z")
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode(mode).parquet(path))


WARC_SCHEMA = ("record_id string, record_type string, target_uri string, "
               "warc_date string, http_status int, payload binary, "
               "src_file string")


def _parse_warc_bytes(data: bytes, src: str):
    """Pure-stdlib WARC (ISO 28500) record parser: yields tuples shaped
    like ``WARC_SCHEMA`` for every record in one (possibly multi-member
    gzip) WARC file.  For ``response`` records the HTTP status line and
    headers are split off; ``payload`` is the raw body bytes."""
    import gzip
    import io
    if data[:2] == b"\x1f\x8b":
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    pos, n = 0, len(data)
    while pos < n:
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0 or not data[pos:pos + 5] == b"WARC/":
            break
        headers = {}
        for line in data[pos:head_end].decode(
                "utf-8", "replace").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        body = data[head_end + 4:head_end + 4 + length]
        rtype = headers.get("warc-type", "")
        status, payload = None, body
        if rtype == "response" and body[:5] == b"HTTP/":
            hdr_end = body.find(b"\r\n\r\n")
            if hdr_end >= 0:
                first = body[:hdr_end].split(b"\r\n", 1)[0].split(b" ")
                if len(first) >= 2 and first[1].isdigit():
                    status = int(first[1])
                payload = body[hdr_end + 4:]
        yield (headers.get("warc-record-id", ""), rtype,
               headers.get("warc-target-uri", ""),
               headers.get("warc-date", ""), status, payload, src)
        pos = head_end + 4 + length
        while data[pos:pos + 2] == b"\r\n":  # inter-record blank lines
            pos += 2


def read_warc(spark: SparkSession, path: str,
              glob: str = "*.warc*",
              record_types: tuple[str, ...] = ("response",)) -> DataFrame:
    """Read WARC crawl archives (the format CommonCrawl actually ships)
    into (record_id, record_type, target_uri, warc_date, http_status,
    payload, src_file) rows — the front door of a 100 TB web-corpus
    pipeline, feeding ``html_strip``/quality/dedup downstream.

    Parallelism is PER FILE: WARC members are not splittable
    mid-stream, and crawls ship as many ~1 GB files by convention
    (CommonCrawl segments a snapshot into ~90k), so task count equals
    file count — the standard ingestion shape for this format, with no
    repacking pass.  Parsing runs as a stdlib state machine inside
    ``mapInPandas`` (Arrow-batched, one Python crossing per file);
    gzip members are decoded transparently.  Non-WARC leading bytes
    terminate that file's parse rather than the job."""
    import pandas as pd

    types = set(record_types)

    def parse(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                rows.extend(r for r in _parse_warc_bytes(
                    bytes(row["content"]), row["path"])
                    if not types or r[1] in types)
            yield pd.DataFrame(rows, columns=[
                "record_id", "record_type", "target_uri", "warc_date",
                "http_status", "payload", "src_file"])

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob).load(path)
             .select("path", "content"))
    return files.mapInPandas(parse, WARC_SCHEMA)
