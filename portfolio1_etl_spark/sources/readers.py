"""File and payload readers — SURVEY.md §2.1 S1-S9.

Everything takes an explicit schema: at 100 TB, inference means an
extra full pass and a silent type flip on the first malformed file.

The reference's readers (portfolio-etl.py): plain CSV (:621, :634,
:659, :748), CSV with a 4-line preamble (:468), TSV (:491, :515, :529),
Excel (:491-530), JSON/XML/GraphQL API payloads (:40-51, :98-121,
:376-408).
"""

from __future__ import annotations

import json
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """S1: plain CSV scan (pd.read_csv parity, portfolio-etl.py:621)."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)  # dev convenience only
    return reader.csv(path)


def read_tsv(
    spark: SparkSession, path: str, schema: T.StructType | None = None, header: bool = True
) -> DataFrame:
    """S3: tab-separated feed (pd.read_csv(sep='\\t'), portfolio-etl.py:491)."""
    return read_csv(spark, path, schema=schema, sep="\t", header=header)


def read_csv_with_preamble(
    spark: SparkSession,
    path: str,
    skip_rows: int,
    schema: T.StructType,
    sep: str = ",",
) -> DataFrame:
    """S2: CSV whose real header sits on line ``skip_rows+1`` (the
    Macy's export, pd.read_csv(header=4), portfolio-etl.py:468).

    Spark's CSV reader has no preamble support (``skipRows`` is
    silently ignored), so: textFile → zipWithIndex (line order is
    guaranteed for a text scan) → drop preamble + header → parse the
    body with ``from_csv`` against the declared schema. This is the
    codebase's one deliberate RDD use — the per-line index genuinely
    needs it; parsing stays in codegen'd ``from_csv``."""
    lines = spark.sparkContext.textFile(path).zipWithIndex()
    body = lines.filter(lambda t: t[1] > skip_rows).map(lambda t: (t[0],))
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    return (
        spark.createDataFrame(body, "value string")
        .select(F.from_csv(F.col("value"), ddl, {"sep": sep}).alias("r"))
        .select("r.*")
    )


def _read_xlsx_minimal(path: str):
    """Dependency-free .xlsx reader: an xlsx file is a ZIP of OOXML
    parts (ECMA-376), so stdlib ``zipfile`` + ``ElementTree`` suffice
    for the feeds this engine ingests — one sheet, a header row,
    string/number cells (shared, inline, and formula-cached strings).
    Returns a pandas DataFrame shaped like ``pd.read_excel``'s."""
    import re
    import zipfile
    import xml.etree.ElementTree as ET

    import pandas as pd

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = ["".join(t.text or "" for t in si.iter(f"{{{ns['m']}}}t"))
                      for si in root.findall("m:si", ns)]
        sheet_names = sorted(
            n for n in z.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if not sheet_names:
            raise ValueError(f"no worksheet found in {path}")
        root = ET.fromstring(z.read(sheet_names[0]))

    def cell_col(ref: str) -> int:
        col = 0
        for ch in ref:
            if ch.isalpha():
                col = col * 26 + (ord(ch.upper()) - 64)
        return col - 1

    rows: list[dict[int, object]] = []
    for row in root.iter(f"{{{ns['m']}}}row"):
        vals: dict[int, object] = {}
        for c in row.findall("m:c", ns):
            idx = cell_col(c.get("r", ""))
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                vals[idx] = "".join(
                    t.text or "" for t in c.iter(f"{{{ns['m']}}}t")
                )
                continue
            v = c.find("m:v", ns)
            if v is None or v.text is None:
                continue
            if ctype == "s":
                vals[idx] = shared[int(v.text)]
            elif ctype in ("str", "b"):
                vals[idx] = v.text if ctype == "str" else bool(int(v.text))
            else:
                f = float(v.text)
                vals[idx] = int(f) if f.is_integer() else f
        rows.append(vals)
    if not rows:
        return pd.DataFrame()
    width = max(max(r) + 1 for r in rows if r)
    grid = [[r.get(i) for i in range(width)] for r in rows]
    df = pd.DataFrame(grid[1:], columns=[str(h) for h in grid[0]])
    # pd.read_excel dtype parity: a numeric column with ANY fractional
    # cell — or ANY missing cell — is float64 throughout (NaN for the
    # gaps); per-cell int narrowing would leave a mixed int/None object
    # column that breaks Arrow schema inference.
    for c in df.columns:
        col = df[c]
        numeric = col.map(
            lambda x: x is None
            or (isinstance(x, (int, float)) and not isinstance(x, bool))
        ).all()
        if numeric and (
            col.map(lambda x: isinstance(x, float)).any()
            or col.isna().any()
        ):
            df[c] = col.astype("float64")
    return df


def read_excel(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """S4: Excel feed (pd.read_excel, portfolio-etl.py:491-530).

    No core-Spark Excel reader exists; these are small dimension feeds,
    so the documented pattern is driver-side parse → createDataFrame
    (Arrow). ``pd.read_excel`` is preferred when an engine
    (openpyxl/xlrd) is installed; otherwise the built-in minimal OOXML
    parser (``_read_xlsx_minimal``) handles .xlsx natively, so Excel
    ingestion works on a bare image too."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path)
    except ImportError:  # no engine installed — use the native parser
        pdf = _read_xlsx_minimal(path)
    return spark.createDataFrame(pdf, schema=schema)


def json_records(
    spark: SparkSession,
    payload: dict | list | str | Iterable[str],
    schema: T.StructType | None = None,
) -> DataFrame:
    """S5/S7: land a fetched JSON payload (REST/GraphQL response body)
    as a DataFrame (portfolio-etl.py:40-51, :376-408).

    The fetch itself is driver-side (network stays on the driver, as in
    the reference); at production scale payloads land on object storage
    and this becomes ``spark.read.json(path, schema=...)`` unchanged
    downstream."""
    if isinstance(payload, (dict, list)):
        payload = json.dumps(payload)
    if isinstance(payload, str):
        payload = [payload]
    ds = spark.createDataFrame([(p,) for p in payload], "value string")
    reader_schema = schema
    if reader_schema is None:
        return spark.read.json(ds.rdd.map(lambda r: r.value))
    return (
        ds.select(F.from_json("value", reader_schema).alias("r")).select("r.*")
    )


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC scan — same pushdown/pruning behavior as parquet (ORC
    carries min/max stripe statistics Spark's reader uses)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines scan with an explicit schema (inference on JSON means
    a full extra pass at scale — callers pass the schema)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan across files written under EVOLVING schemas:
    ``mergeSchema`` unions the per-file footers (added columns come
    back NULL for old files) — the read side of additive schema
    evolution. Costs a footer scan per file, so production tables
    cache the merged schema in a catalog; semantics here are what
    matters."""
    return spark.read.option("mergeSchema", "true").parquet(path)
