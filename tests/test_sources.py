"""Unit tests for the raw-format ingest layer (SURVEY.md §2.1)."""

import os

import pandas as pd
import pytest

from tfl_bikes_data_pipeline_spark.sources import raw, spatial, xlsx, xml_feed


def test_csv_schema_read_is_all_string(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("A Col,B Col\n1,x\n2,\n")
    df = raw.read_csv_with_schema(spark, str(p), ["A Col", "B Col"])
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]
    rows = {r["A Col"]: r["B Col"] for r in df.collect()}
    assert rows == {"1": "x", "2": None}


def test_normalize_headers_positional(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("Rental Id,Bike Id\n10,20\n")
    df = raw.read_csv_with_schema(spark, str(p), ["Rental Id", "Bike Id"])
    out = raw.normalize_headers(df, ["rental_id", "bike_id"])
    assert out.columns == ["rental_id", "bike_id"]
    with pytest.raises(ValueError):
        raw.normalize_headers(df, ["only_one"])


def test_merge_schema_reconciles_drift(spark, tmp_path):
    d = str(tmp_path / "drift")
    spark.createDataFrame([(1, "a")], ["id", "old_col"]).write.parquet(f"{d}/w1")
    spark.createDataFrame([(2, "b", 5)], ["id", "old_col", "new_col"]).write.parquet(f"{d}/w2")
    df = raw.read_parquet_dir(spark, f"{d}/w*")
    assert set(df.columns) == {"id", "old_col", "new_col"}
    assert df.count() == 2
    assert df.where("new_col IS NULL").count() == 1


def test_station_xml_roundtrip(spark, tmp_path, sf_dir):
    xml_path = str(tmp_path / "stations.xml")
    xml_feed.write_stations_xml(spark, sf_dir, xml_path)
    parsed = xml_feed.parse_station_xml(spark, xml_path)
    n_suppliers = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet")).count()
    assert parsed.count() == n_suppliers
    typed = xml_feed.typed_stations(parsed)
    assert typed.schema["latitude"].dataType.simpleString() == "decimal(8,6)"
    assert typed.schema["longitude"].dataType.simpleString() == "decimal(9,6)"
    assert typed.where("station_id IS NULL").count() == 0


def test_xml_missing_nodes_become_null(spark, tmp_path):
    p = tmp_path / "partial.xml"
    p.write_text("<stations><station><id>7</id><name>x</name></station></stations>")
    df = xml_feed.parse_station_xml(spark, str(p))
    row = df.first()
    assert row["id"] == "7" and row["lat"] is None and row["long"] is None


def test_xlsx_gate_and_pandas_seam(spark):
    pdf = pd.DataFrame({"a": ["1", None], "b": ["x", "y"]})
    df = xlsx.from_pandas_strings(spark, pdf)
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]
    assert df.where("a IS NULL").count() == 1
    if not xlsx.xlsx_support():
        with pytest.raises(NotImplementedError):
            xlsx.read_xlsx(spark, "/nonexistent.xlsx")


def test_nearest_grid_argmin_deterministic(spark):
    # station at (3, 4): nearest grid point is (5,5) at dist2=5; tie case
    # station (5,0) between (0,0) and (10,0) -> both dist2=25, lower
    # grid_id wins.
    stations = spark.createDataFrame(
        [(1, 3, 4), (2, 5, 0)], ["station_id", "lat", "lon"]
    )
    grid = spark.createDataFrame(
        [(0, 0, 0), (1, 0, 5), (2, 5, 5), (3, 10, 0)], ["grid_id", "glat", "glon"]
    )
    out = {r["station_id"]: (r["grid_id"], r["dist2"]) for r in
           spatial.nearest_grid(stations, grid).collect()}
    assert out[1] == (2, 5)
    assert out[2] == (0, 25)


def test_csv_malformed_rows_tolerated(spark, tmp_path):
    """PERMISSIVE read discipline: short rows null-pad, long rows drop
    extras — the feed's header/width drift never kills the job."""
    p = tmp_path / "drift.csv"
    p.write_text("A,B\n1,x\n2\n3,y,z\n")
    df = raw.read_csv_with_schema(spark, str(p), ["A", "B"])
    rows = {r["A"]: r["B"] for r in df.collect()}
    assert rows["1"] == "x"
    assert rows["2"] is None
    assert rows["3"] == "y"


def test_csv_quarantine_splits_malformed_rows(spark, tmp_path):
    """Structurally broken rows must be quarantined verbatim, not
    silently dropped or nulled into the clean stream."""
    from tfl_bikes_data_pipeline_spark.sources.raw import (
        read_csv_quarantine,
        split_quarantine,
    )

    p = tmp_path / "in.csv"
    good = ['id,name,qty', '1,alpha,10', '2,beta,20', '4,delta,40']
    bad = ['3,"unclosed quote,30']
    p.write_text("\n".join(good + bad) + "\n")
    raw = read_csv_quarantine(spark, str(p), ["id", "name", "qty"])
    clean, dead = split_quarantine(raw)
    assert {r["id"] for r in clean.collect()} == {"1", "2", "4"}
    dead_rows = [r["raw_line"] for r in dead.collect()]
    assert len(dead_rows) == 1 and "unclosed quote" in dead_rows[0]
    # accounting: nothing lost
    assert clean.count() + dead.count() == 4


def test_json_quarantine_routes_bad_records(spark, tmp_path):
    """Malformed NDJSON lines must land verbatim in the dead letter;
    clean rows parse with the explicit schema."""
    from pyspark.sql import types as T

    from tfl_bikes_data_pipeline_spark.sources.raw import (
        read_json_quarantine,
        split_quarantine,
    )

    p = tmp_path / "feed.json"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        '{"id": "NOT_A_NUMBER", "name": "type clash"}\n'
        "this is not json at all\n"
        '{"id": 3, "name": "also ok"}\n'
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    clean, dead = split_quarantine(read_json_quarantine(spark, str(p), schema))
    assert {r["id"] for r in clean.collect()} == {1, 3}
    dead_lines = [r["raw_line"] for r in dead.collect()]
    assert len(dead_lines) == 2
    assert "this is not json at all" in dead_lines
    assert any("NOT_A_NUMBER" in l for l in dead_lines)


def test_xlsx_stdlib_codec_roundtrip(spark, tmp_path):
    """The stdlib XLSX codec must round-trip header + rows losslessly,
    including XML-special characters, None cells, and shared-string-free
    inline text."""
    p = str(tmp_path / "mini.xlsx")
    header = ["Id", "Name <&>", "Qty"]
    rows = [["1", "a & b", "10"], ["2", None, "<3>"], ["3", "plain", None]]
    xlsx.write_minimal_xlsx(p, header, rows)
    back = xlsx.read_xlsx(spark, p)
    assert back.columns == header
    got = [[r[c] for c in header] for r in back.orderBy("Id").collect()]
    # None cells come back as empty inline strings (the all-string wire
    # shape treats missing and empty alike at the ingest edge)
    want = [[v if v is not None else "" for v in row] for row in rows]
    assert got == want


def test_xlsx_shared_strings_and_numbers(spark, tmp_path):
    """Files from other writers use shared strings and numeric cells —
    the parser must handle both (crafted part-level fixture)."""
    import zipfile as _zf

    p = str(tmp_path / "shared.xlsx")
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row><c r="A2" t="s"><v>2</v></c><c r="B2"><v>42.5</v></c></row>'
        "</sheetData></worksheet>"
    )
    shared = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<si><t>k</t></si><si><t>v</t></si>"
        "<si><r><t>ri</t></r><r><t>ch</t></r></si></sst>"
    )
    with _zf.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", xlsx._CONTENT_TYPES)
        z.writestr("_rels/.rels", xlsx._ROOT_RELS)
        z.writestr("xl/workbook.xml", xlsx._WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", xlsx._WB_RELS)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    pdf = xlsx.parse_xlsx(p)
    assert list(pdf.columns) == ["k", "v"]
    assert pdf.iloc[0].tolist() == ["rich", "42.5"]


def test_netcdf3_codec_roundtrip(tmp_path):
    """The stdlib NetCDF-3 codec must round-trip multi-variable files
    (int32 grid + float64 axis) bit-exactly, including 4-byte padding
    of odd-sized payloads."""
    import numpy as np

    from tfl_bikes_data_pipeline_spark.sources.netcdf3 import (
        parse_netcdf3,
        write_netcdf3,
    )

    p = str(tmp_path / "grid.nc")
    tas = (np.arange(2 * 3 * 5).reshape(2, 3, 5) * 13 % 251).astype("int32")
    lat = np.linspace(-5.5, 7.25, 3).astype("float64")
    flag = np.array([1, 0, 1], dtype="int8")  # odd byte count → padding
    write_netcdf3(
        p,
        {"time": 2, "y": 3, "x": 5},
        {"tas": (("time", "y", "x"), tas), "lat": (("y",), lat),
         "flag": (("y",), flag)},
    )
    back = parse_netcdf3(p)
    assert back["tas"][0] == ("time", "y", "x")
    assert (back["tas"][1] == tas).all()
    assert (back["lat"][1] == lat).all()
    assert (back["flag"][1] == flag).all()


def test_netcdf3_rejects_non_netcdf(tmp_path):
    p = tmp_path / "junk.nc"
    p.write_bytes(b"PK\x03\x04 definitely a zip")
    import pytest as _pytest

    from tfl_bikes_data_pipeline_spark.sources.netcdf3 import parse_netcdf3

    with _pytest.raises(ValueError, match="magic"):
        parse_netcdf3(str(p))


def test_xlsx_unaddressed_cell_follows_previous(spark, tmp_path):
    """Per ECMA-376, a cell without r= follows the previous cell's
    column — sparse addressing must not shift it."""
    import zipfile as _zf

    p = str(tmp_path / "sparse.xlsx")
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row><c r="A1" t="inlineStr"><is><t>h1</t></is></c>'
        '<c r="B1" t="inlineStr"><is><t>h2</t></is></c>'
        '<c r="C1" t="inlineStr"><is><t>h3</t></is></c>'
        '<c r="D1" t="inlineStr"><is><t>h4</t></is></c></row>'
        '<row><c r="C2"><v>x</v></c><c><v>y</v></c></row>'
        "</sheetData></worksheet>"
    )
    with _zf.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", xlsx._CONTENT_TYPES)
        z.writestr("_rels/.rels", xlsx._ROOT_RELS)
        z.writestr("xl/workbook.xml", xlsx._WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", xlsx._WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    pdf = xlsx.parse_xlsx(p)
    row = pdf.iloc[0]
    assert row["h3"] == "x" and row["h4"] == "y"
    assert row["h1"] is None and row["h2"] is None


def test_xlsx_phonetic_runs_excluded(tmp_path):
    """<rPh> phonetic text must not leak into shared-string values."""
    import zipfile as _zf

    p = str(tmp_path / "furigana.xlsx")
    shared = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<si><t>tokyo</t><rPh><t>toukyou</t></rPh></si></sst>"
    )
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<sheetData><row><c r="A1" t="s"><v>0</v></c></row>'
        '<row><c r="A2" t="s"><v>0</v></c></row></sheetData></worksheet>'
    )
    with _zf.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", xlsx._CONTENT_TYPES)
        z.writestr("_rels/.rels", xlsx._ROOT_RELS)
        z.writestr("xl/workbook.xml", xlsx._WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", xlsx._WB_RELS)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    pdf = xlsx.parse_xlsx(p)
    assert list(pdf.columns) == ["tokyo"]
    assert pdf.iloc[0, 0] == "tokyo"


def test_csv_wire_preserves_newlines_and_edge_whitespace(spark, tmp_path):
    """Review r5: quoted embedded newlines split into garbage rows
    without multiLine, and the CSV WRITER's ignore*WhiteSpace defaults
    silently trimmed whitespace-edged values — the wire must round-trip
    both exactly."""
    from tfl_bikes_data_pipeline_spark.sources.raw import (
        read_csv_with_schema,
        string_schema,
    )

    rows = [("1", "line1\nline2"), ("2", "  padded  "), ("3", "plain")]
    df = spark.createDataFrame(rows, "id string, s string")
    out = str(tmp_path / "wire_csv")
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(out)
    )
    back = {r.id: r.s for r in read_csv_with_schema(spark, out, ["id", "s"]).collect()}
    assert back == dict(rows), back
