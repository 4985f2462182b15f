"""Source-layer tests: dynamic cube schema, zip staging, WDS client
with canned transport, merge registry ordering."""

from __future__ import annotations

import zipfile

from geo_explorer_etl_spark.sources.cube_csv import (
    cube_schema,
    extract_zip,
    read_cube_csv,
)
from geo_explorer_etl_spark.sources.merge_registry import MergeRegistry


def test_cube_schema_dynamic_tail():
    st = cube_schema(["Geography", "Sector", "Age group"])
    names = [f.name for f in st.fields]
    assert names[:9] == [
        "REF_DATE", "DGUID", "UOM", "UOM_ID", "VECTOR",
        "COORDINATE", "STATUS", "SYMBOL", "VALUE",
    ]
    assert names[9:] == ["Geography", "Sector", "Age group"]
    by_name = {f.name: f.dataType.simpleString() for f in st.fields}
    assert by_name["UOM_ID"] == "smallint"
    assert by_name["VALUE"] == "double"
    assert by_name["Age group"] == "string"


def test_zip_extract_and_read(spark, tmp_path):
    csv_text = (
        "REF_DATE,DGUID,UOM,UOM_ID,VECTOR,COORDINATE,STATUS,SYMBOL,VALUE,Sector\n"
        '2018,2016A000011124,Number,229,v1,1.1,,,10.5,Public\n'
    )
    zpath = tmp_path / "35100177-eng.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("35100177.csv", csv_text)
    csv_path = extract_zip(str(zpath), str(tmp_path / "staging"))
    df = read_cube_csv(spark, csv_path, ["Sector"])
    row = df.first()
    assert row["VALUE"] == 10.5
    assert row["UOM_ID"] == 229
    assert row["Sector"] == "Public"
    # malformed rows don't kill the scan (PERMISSIVE)
    assert df.count() == 1


def test_merge_registry_ordering(tmp_path):
    reg = MergeRegistry(str(tmp_path / "m.json"))
    reg.register(100, [200, 300])
    assert reg.is_master(100) and reg.is_sibling(200)
    assert reg.master_of(300) == 100
    # masters first (sibling reuses master's indicators)
    assert reg.ordered([300, 100, 200]) == [100, 200, 300]
    # persisted across instances
    reg2 = MergeRegistry(str(tmp_path / "m.json"))
    assert reg2.siblings_of(100) == [200, 300]


def test_product_defaults_fallback_chain(tmp_path):
    import json

    from geo_explorer_etl_spark.sources.product_defaults import ProductDefaults
    from geo_explorer_etl_spark.plans.star_schema import CHART_DEFAULTS

    p = tmp_path / "product_defaults.json"
    p.write_text(json.dumps({
        "default": {"DefaultBreaks": 7},
        "35100177": {"ColorTo": "#112233", "PrimaryChartTypeId": 3},
    }))
    pd_reg = ProductDefaults(str(p))
    d = pd_reg.for_product(35100177)
    assert d["ColorTo"] == "#112233"            # per-pid wins
    assert d["DefaultBreaks"] == 7              # file default wins over engine
    assert d["ColorFrom"] == CHART_DEFAULTS["ColorFrom"]   # engine fallback
    other = pd_reg.for_product(99999999)
    assert other["DefaultBreaks"] == 7 and other["ColorTo"] == CHART_DEFAULTS["ColorTo"]
    # no file at all -> engine defaults
    assert ProductDefaults(None).for_product(1) == CHART_DEFAULTS
