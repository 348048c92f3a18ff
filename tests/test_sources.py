"""Ingestion-surface tests: connector payload parsing (F1-F6),
file readers (S1-S4), fallbacks (S11), multi-tenant loops (S10) —
fixture payloads mirror the reference's API shapes (FIXTURES.md §A6)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from portfolio1_etl_spark.schemas import SALES
from portfolio1_etl_spark.sources import (
    Connector,
    file_feed,
    json_records,
    normalize_order_lines,
    parse_orders_xml,
    read_csv_with_preamble,
    read_tsv,
    run_connectors,
)

# --- fixture payloads (shaped like the reference's APIs) -------------------

WALMART_PAYLOAD = {  # nested orderLines.orderLine (portfolio-etl.py:57-76)
    "list": {
        "elements": {
            "order": [
                {
                    "purchaseOrderId": "PO1",
                    "orderLines": {
                        "orderLine": [
                            {"item": {"sku": "W-1"}, "orderLineQuantity": {"amount": "2"}},
                            {"item": {"sku": "W-2"}, "orderLineQuantity": {"amount": "1"}},
                        ]
                    },
                },
                {
                    "purchaseOrderId": "PO2",
                    "orderLines": {
                        "orderLine": [
                            {"item": {"sku": "W-1"}, "orderLineQuantity": {"amount": "3"}}
                        ]
                    },
                },
            ]
        }
    }
}

MIRAKL_PAYLOAD = {  # order_lines + CANCELED order (portfolio-etl.py:312-329)
    "orders": [
        {
            "order_state": "SHIPPING",
            "order_lines": [{"offer_sku": "M-1", "quantity": 2}],
        },
        {
            "order_state": "CANCELED",
            "order_lines": [{"offer_sku": "M-9", "quantity": 5}],
        },
    ]
}

HOUZZ_XML = """
<Orders>
  <Order><Status>Active</Status>
    <OrderItem><SKU>H-1</SKU><Quantity>2</Quantity></OrderItem>
    <OrderItem><SKU>H-2</SKU><Quantity>1</Quantity></OrderItem>
  </Order>
  <Order><Status>Active</Status>
    <OrderItem><SKU>H-1</SKU><Quantity>4</Quantity></OrderItem>
  </Order>
</Orders>
"""


def _walmart_parse(spark, payload):
    orders = json_records(spark, payload).select(
        F.explode("list.elements.order").alias("o")
    )
    return orders.select(F.explode("o.orderLines.orderLine").alias("l")).select(
        F.col("l.item.sku").cast("string").alias("sku"),
        F.col("l.orderLineQuantity.amount").cast("double").alias("qty"),
        F.lit("walmart").alias("site"),
    )


def _mirakl_parse(site):
    def parse(spark, payload):
        orders = json_records(spark, payload).select(F.explode("orders").alias("o")).select("o.*")
        return normalize_order_lines(
            orders,
            "order_lines",
            "offer_sku",
            "quantity",
            site,
            order_filter=F.col("order_state") != "CANCELED",
        )

    return parse


def test_walmart_nested_flatten(spark):
    df = _walmart_parse(spark, WALMART_PAYLOAD)
    rows = {(r.sku, r.qty) for r in df.collect()}
    assert rows == {("W-1", 2.0), ("W-2", 1.0), ("W-1", 3.0)}


def test_mirakl_canceled_filter(spark):
    df = _mirakl_parse("mirakl-a")(spark, MIRAKL_PAYLOAD)
    rows = [(r.sku, r.qty, r.site) for r in df.collect()]
    assert rows == [("M-1", 2.0, "mirakl-a")]


def test_houzz_xml(spark):
    df = parse_orders_xml(spark, [HOUZZ_XML], "houzz")
    rows = sorted((r.sku, r.qty) for r in df.collect())
    assert rows == [("H-1", 2.0), ("H-1", 4.0), ("H-2", 1.0)]


def test_connector_error_yields_typed_empty(spark):
    def boom():
        raise ConnectionError("marketplace down")

    c = Connector(name="dead", fetch=boom, parse=lambda s, p: None)
    res = c.run(spark)
    assert res.status == "ERROR" and res.rows == 0
    assert res.df.schema == SALES  # typed empty, not a sentinel row


def test_multi_tenant_union_and_run(spark):
    tenants = [{"site": "dsco-a"}, {"site": "dsco-b"}]

    def fetch(tenant):
        return {"orders": [
            {"order_state": "OK", "order_lines": [{"offer_sku": f"{tenant['site']}-sku", "quantity": 1}]}
        ], "_site": tenant["site"]}

    def parse(spark_, payload):
        return _mirakl_parse(payload["_site"])(spark_, payload)

    dsco = Connector(name="dsco", fetch=fetch, parse=parse, tenants=tenants)
    unioned, results = run_connectors(spark, [dsco])
    assert [r.status for r in results] == ["OK"]
    assert {r.site for r in unioned.collect()} == {"dsco-a", "dsco-b"}


def test_preamble_csv(spark, tmp_path):
    p = tmp_path / "macys.csv"
    p.write_text("report for week\n,,\ngenerated,by,export\nblank\nsku,qty\nM-1,2\nM-2,5\n")
    schema = T.StructType(
        [T.StructField("sku", T.StringType()), T.StructField("qty", T.DoubleType())]
    )
    df = read_csv_with_preamble(spark, str(p), skip_rows=4, schema=schema)
    assert sorted((r.sku, r.qty) for r in df.collect()) == [("M-1", 2.0), ("M-2", 5.0)]


def test_tsv_and_file_feed_fallback(spark, tmp_path):
    p = tmp_path / "amazon.tsv"
    p.write_text("asin\tunits\nA-1\t3\n")
    schema = T.StructType(
        [T.StructField("asin", T.StringType()), T.StructField("units", T.DoubleType())]
    )
    df = file_feed(
        spark, str(p), "amazon", "asin", "units", read_tsv, schema=schema
    )
    assert [(r.sku, r.qty, r.site) for r in df.collect()] == [("A-1", 3.0, "amazon")]

    missing = file_feed(
        spark, str(tmp_path / "nope.tsv"), "hsn", "a", "b", read_tsv, schema=schema
    )
    assert missing.count() == 0 and missing.schema == SALES


def test_wayfair_graphql_shape_topk(spark):
    # GraphQL response (portfolio-etl.py:376-437): orders with products;
    # source-side limit/sort becomes orderBy(desc).limit (O2).
    payload = {
        "data": {
            "purchaseOrders": [
                {"poNumber": "A", "poDate": "2024-01-03", "products": [{"partNumber": "WF-1", "quantity": 1}]},
                {"poNumber": "B", "poDate": "2024-01-05", "products": [{"partNumber": "WF-2", "quantity": 2}]},
                {"poNumber": "C", "poDate": "2024-01-01", "products": [{"partNumber": "WF-3", "quantity": 3}]},
            ]
        }
    }
    orders = json_records(spark, payload).select(F.explode("data.purchaseOrders").alias("o"))
    latest2 = orders.orderBy(F.col("o.poDate").desc()).limit(2)
    lines = latest2.select(F.explode("o.products").alias("p")).select(
        F.col("p.partNumber").alias("sku"), F.col("p.quantity").cast("double").alias("qty")
    )
    assert {r.sku for r in lines.collect()} == {"WF-1", "WF-2"}


# --- S4: Excel ingestion ----------------------------------------------------


def _write_min_xlsx(path, header, rows, inline=False):
    """Write a real (minimal, spec-conformant) .xlsx: a ZIP of OOXML
    parts. Strings go through sharedStrings (like openpyxl) or inline
    (like some exporters) to exercise both parser paths."""
    import zipfile

    def esc(s):
        return (str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;"))

    all_rows = [header] + rows
    shared, cells_xml = [], []
    for r_i, row in enumerate(all_rows, start=1):
        cs = []
        for c_i, v in enumerate(row):
            ref = f"{chr(65 + c_i)}{r_i}"
            if v is None:  # missing cell — no <c> element at all
                continue
            if isinstance(v, str):
                if inline:
                    cs.append(f'<c r="{ref}" t="inlineStr"><is><t>{esc(v)}</t></is></c>')
                else:
                    if v not in shared:
                        shared.append(v)
                    cs.append(f'<c r="{ref}" t="s"><v>{shared.index(v)}</v></c>')
            else:
                cs.append(f'<c r="{ref}"><v>{v}</v></c>')
        cells_xml.append(f'<row r="{r_i}">{"".join(cs)}</row>')
    M = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    CT = "http://schemas.openxmlformats.org/package/2006/content-types"
    PR = "http://schemas.openxmlformats.org/package/2006/relationships"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml",
            f'<?xml version="1.0"?><Types xmlns="{CT}">'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
            "</Types>")
        z.writestr("_rels/.rels",
            f'<?xml version="1.0"?><Relationships xmlns="{PR}">'
            f'<Relationship Id="rId1" Type="{R}/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>")
        z.writestr("xl/workbook.xml",
            f'<?xml version="1.0"?><workbook xmlns="{M}" xmlns:r="{R}">'
            '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>')
        z.writestr("xl/_rels/workbook.xml.rels",
            f'<?xml version="1.0"?><Relationships xmlns="{PR}">'
            f'<Relationship Id="rId1" Type="{R}/worksheet" Target="worksheets/sheet1.xml"/>'
            f'<Relationship Id="rId2" Type="{R}/sharedStrings" Target="sharedStrings.xml"/>'
            "</Relationships>")
        z.writestr("xl/sharedStrings.xml",
            f'<?xml version="1.0"?><sst xmlns="{M}" count="{len(shared)}" uniqueCount="{len(shared)}">'
            + "".join(f"<si><t>{esc(s)}</t></si>" for s in shared) + "</sst>")
        z.writestr("xl/worksheets/sheet1.xml",
            f'<?xml version="1.0"?><worksheet xmlns="{M}"><sheetData>'
            + "".join(cells_xml) + "</sheetData></worksheet>")


def test_read_excel_real_workbook(spark, tmp_path):
    """S4 end-to-end with a real .xlsx on disk — works with or without
    a pandas Excel engine (native OOXML fallback)."""
    from portfolio1_etl_spark.sources.readers import read_excel

    p = str(tmp_path / "feed.xlsx")
    _write_min_xlsx(p, ["sku", "qty", "price"],
                    [["SKU-1", 2, 9.99], ["SKU-2", 5, 19.5]])
    df = read_excel(spark, p)
    rows = {r.sku: r for r in df.collect()}
    assert set(rows) == {"SKU-1", "SKU-2"}
    assert rows["SKU-1"].qty == 2 and abs(rows["SKU-2"].price - 19.5) < 1e-9


def test_read_excel_int_column_with_gaps(spark, tmp_path):
    """pd.read_excel parity: an integer column with a MISSING cell is
    float64 (NaN for the gap), not an object column of ints+None —
    mixed object columns break Arrow schema inference downstream."""
    import math

    from portfolio1_etl_spark.sources.readers import _read_xlsx_minimal

    p = str(tmp_path / "gaps.xlsx")
    _write_min_xlsx(p, ["sku", "qty"], [["A", 2], ["B", None], ["C", 7]])
    pdf = _read_xlsx_minimal(p)
    assert str(pdf["qty"].dtype) == "float64"
    assert math.isnan(pdf["qty"].iloc[1]) and pdf["qty"].iloc[2] == 7.0
    # and the Spark path ingests it without Arrow schema errors
    from portfolio1_etl_spark.sources.readers import read_excel

    rows = {r.sku: r for r in read_excel(spark, p).collect()}
    assert rows["B"].qty is None and rows["C"].qty == 7.0


def test_read_excel_inline_strings(spark, tmp_path):
    from portfolio1_etl_spark.sources.readers import read_excel

    p = str(tmp_path / "inline.xlsx")
    _write_min_xlsx(p, ["sku", "qty"], [["A&B <x>", 1]], inline=True)
    rows = read_excel(spark, p).collect()
    assert rows[0].sku == "A&B <x>" and rows[0].qty == 1
