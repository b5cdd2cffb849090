"""XLSX ingest edge (SURVEY.md §2.1 S7).

The reference normalizes stray Excel weekly files to CSV with pandas
(``airflow/dags/ingest_bike_data.py:136-144``) before the schema'd read.
Same shape here — convert at the ingest edge, Spark from the first
DataFrame on — but the codec needs NO third-party Excel engine: XLSX is
a zip of XML parts, so :func:`parse_xlsx` reads the workbook with
stdlib ``zipfile`` + ``ElementTree`` (workbook relationships → first
worksheet, shared strings, inline strings, per-cell column addressing
with gap fill). openpyxl, when importable, is used as a fallback for
exotic files; in this container the stdlib path carries the format
end-to-end, and :func:`write_minimal_xlsx` produces spec-conformant
files so the whole S7 edge sits inside the correctness gate
(``q_xlsx_roundtrip``).

All cells surface as STRINGS (numbers keep their literal ``<v>`` text),
matching the CSV path's read-then-cast discipline.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"


def xlsx_support() -> bool:
    """Always true: the stdlib codec needs no optional dependency.
    Kept for API compatibility with the round-1..3 import gate."""
    return True


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'AB7' → 27: base-26 column letters."""
    idx = 0
    for ch in re.match(r"[A-Z]+", cell_ref).group(0):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).iter(f"{_NS}si"):
        # plain <t>, plus rich-text runs <r><t> — concatenated.
        # Phonetic runs (<rPh>, furigana in East-Asian workbooks) are
        # NOT cell text and must be skipped, or values come back with
        # the reading appended (Excel/openpyxl render only <t>/<r>).
        parts = []
        for child in si:
            if child.tag == f"{_NS}t":
                parts.append(child.text or "")
            elif child.tag == f"{_NS}r":
                parts.extend(t.text or "" for t in child.iter(f"{_NS}t"))
        out.append("".join(parts))
    return out


def _first_sheet_path(zf: zipfile.ZipFile) -> str:
    """Resolve the FIRST sheet via workbook relationships (sheet order
    in workbook.xml, r:id → target in workbook.xml.rels) instead of
    assuming 'sheet1.xml' — writers number parts arbitrarily."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        r.get("Id"): r.get("Target") for r in rels.iter(f"{_REL_NS}Relationship")
    }
    first = next(wb.iter(f"{_NS}sheet"))
    target = rid_to_target[first.get(_RID)]
    if target.startswith("/"):  # package-absolute target
        return target.lstrip("/")
    return target if target.startswith("xl/") else f"xl/{target}"


def parse_xlsx(path: str) -> pd.DataFrame:
    """First worksheet → pandas DataFrame of strings (row 1 = header,
    missing cells = None). Handles shared strings (``t="s"``), inline
    strings (``t="inlineStr"``), booleans, and raw numeric/formula
    ``<v>`` text."""
    with zipfile.ZipFile(path) as zf:
        strings = _shared_strings(zf)
        sheet = ET.fromstring(zf.read(_first_sheet_path(zf)))
    rows: list[dict[int, str]] = []
    for row in sheet.iter(f"{_NS}row"):
        cells: dict[int, str] = {}
        last_idx = -1
        for c in row.iter(f"{_NS}c"):
            ref, ctype = c.get("r"), c.get("t", "n")
            if ref is None:
                # per ECMA-376 an unaddressed cell FOLLOWS the previous
                # cell's column (not the count of cells seen — sparse
                # addressing would shift it)
                ref_idx = last_idx + 1
            else:
                ref_idx = _col_index(ref)
            last_idx = ref_idx
            if ctype == "s":
                v = c.find(f"{_NS}v")
                cells[ref_idx] = strings[int(v.text)] if v is not None else None
            elif ctype == "inlineStr":
                cells[ref_idx] = "".join(
                    t.text or "" for t in c.iter(f"{_NS}t")
                )
            elif ctype == "b":
                v = c.find(f"{_NS}v")
                cells[ref_idx] = (
                    None if v is None else ("TRUE" if v.text == "1" else "FALSE")
                )
            else:  # n / str (formula result) / d — keep literal text
                v = c.find(f"{_NS}v")
                cells[ref_idx] = v.text if v is not None else None
        rows.append(cells)
    if not rows:
        return pd.DataFrame()
    width = max(max(r.keys(), default=-1) for r in rows) + 1
    table = [[r.get(i) for i in range(width)] for r in rows]
    header, data = table[0], table[1:]
    cols = [h if h is not None else f"col{i}" for i, h in enumerate(header)]
    return pd.DataFrame(data, columns=cols)


def read_xlsx(spark: SparkSession, path: str) -> DataFrame:
    """XLSX → pandas (stdlib codec; openpyxl fallback for files the
    minimal parser rejects) → Spark DataFrame of strings."""
    try:
        pdf = parse_xlsx(path)
    except Exception as parse_err:
        try:
            import openpyxl  # noqa: F401
        except ImportError:
            # surface the PARSE failure, not a missing-dependency error:
            # a corrupt file is an input problem, not an install problem.
            raise parse_err
        pdf = pd.read_excel(path, dtype=str)
    return from_pandas_strings(spark, pdf)


def from_pandas_strings(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """The Spark-side seam shared by the XLSX and any other
    pandas-at-the-edge reader: everything string, NULLs preserved.
    Schema is EXPLICIT (all-string DDL from the header) so a
    zero-row file still yields a typed empty relation instead of a
    cannot-infer-schema error."""
    pdf = pdf.astype("string").where(pdf.notna(), None)
    schema = ", ".join(f"`{c}` string" for c in pdf.columns)
    return spark.createDataFrame(pdf.astype(object), schema=schema)


# ---------------------------------------------------------------------------
# minimal writer (fixtures + the reference's "stray Excel weekly file")
# ---------------------------------------------------------------------------

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
)
_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def write_minimal_xlsx(path: str, header: list[str], rows: list[list]) -> str:
    """Spec-conformant single-sheet XLSX via stdlib zipfile: every cell
    an inline string (``t="inlineStr"``) — the lossless all-string wire
    shape the ingest edge expects back."""
    def row_xml(values) -> str:
        cells = "".join(
            f'<c t="inlineStr"><is><t>{escape("" if v is None else str(v))}</t></is></c>'
            for v in values
        )
        return f"<row>{cells}</row>"

    body = row_xml(header) + "".join(row_xml(r) for r in rows)
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{body}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return path


# ---------------------------------------------------------------------------
# declared query: the whole S7 edge inside the correctness gate
# ---------------------------------------------------------------------------

#: keep the roundtrip file weekly-file-sized (the reference's stray
#: Excel files are small weekly drops; the modulus keeps the driver-side
#: edge conversion bounded at any SF).
XLSX_SAMPLE_MOD = 20


def q_xlsx_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 end-to-end: a deterministic sample of events → minimal XLSX
    on disk (inline strings, the stray-weekly-file wire shape) →
    stdlib parse → all-string Spark frame → typed aggregate. The
    driver-side conversion mirrors the reference's pandas
    normalization (ingest_bike_data.py:136-144) and is bounded by the
    sample modulus — Spark takes over from the first DataFrame on. The
    oracle computes the same aggregate straight from parquet, so any
    loss in the XLSX layer (escaping, cell addressing, string typing)
    fails the hash."""
    import os

    from pyspark.sql import functions as F

    from ..tables import load_table
    from ..tmputil import sweep_tmpdir

    events = load_table(spark, sf_dir, "events")
    sample = (
        events.where(F.col("event_id") % XLSX_SAMPLE_MOD == 0)
        .select(
            F.col("event_id").cast("string"),
            F.col("user_id").cast("string"),
            "event_type",
            F.col("value").cast("string"),
        )
        .collect()
    )
    path = os.path.join(sweep_tmpdir("raw_xlsx_"), "events.xlsx")
    write_minimal_xlsx(
        path,
        ["Event Id", "User Id", "Event Type", "Value"],
        [list(r) for r in sample],
    )
    raw = read_xlsx(spark, path)
    typed = raw.select(
        F.col("Event Id").cast("long").alias("event_id"),
        F.col("User Id").cast("long").alias("user_id"),
        # the minimal XLSX wire format cannot distinguish NULL from an
        # empty inline string — empty cells decode as NULL uniformly
        F.nullif(F.col("Event Type"), F.lit("")).alias("event_type"),
        # a NULL value serializes as an empty cell; reading it back as
        # "" must round-trip to NULL, not a NumberFormatException
        F.nullif(F.col("Value"), F.lit("")).cast("double").alias("value"),
    )
    return (
        typed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("string")
            .cast("double")
            .alias("total_value"),
            F.max("event_id").alias("max_event_id"),
        )
        .orderBy("event_type")
    )


ORACLES = {
    "q_xlsx_roundtrip": f"""
        SELECT event_type, count(1)::BIGINT AS cnt,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                   AS total_value,
               max(event_id)::BIGINT AS max_event_id
        FROM events
        WHERE event_id % {XLSX_SAMPLE_MOD} = 0
        GROUP BY event_type ORDER BY event_type
    """
}

QUERIES = {"q_xlsx_roundtrip": q_xlsx_roundtrip}

BENCH: list = []
