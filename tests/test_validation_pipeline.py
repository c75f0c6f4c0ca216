"""Golden tests for the human-validation loop (SURVEY §3.1 tail):
candidates -> check sheet -> retreatment -> validated sheet + WP CSV ->
association update feed. Sheets are CSV snapshots; geocode is faked."""

from __future__ import annotations

from pyspark.sql import functions as F

from wopen_spark.functions.strings import title_case
from wopen_spark.pipelines import (
    CsvSheetStore,
    ValidationConfig,
    assos_to_sheet,
    update_assos,
    validation_retreatment,
)
from wopen_spark.tables import Table

RAW_COLS = (
    "titre string, Facebook_ID string, Facebook_new_URL string, "
    "check_levenshtein_similarity_facebook string, adrg_codepostal string, "
    "adrg_achemine string, adrg_libvoie string, Objet_Social string, "
    "objet string, date_extract date, adrs_codepostal string"
)


def _raw_row(titre, fid, band, cp="75010", ach="PARIS CEDEX"):
    return (
        titre, fid, f"https://facebook.com/{titre.lower()}", band, cp, ach,
        "5 rue de l'eglise", "chant choral, musique ", "objet text",
        __import__("datetime").date(2026, 1, 1), "75010",
    )


def _setup_raw(spark, wh):
    rows = [
        _raw_row("ASSO ROCK", "99", "fb_account"),
        _raw_row("ASSO SOFT", "98", "potential_fb_account"),
        _raw_row("ASSO NONE", "97", "no_fb_account"),  # band-filtered out
        _raw_row("ASSO OLD", "96", "fb_account"),  # already validated
        _raw_row("LYCEE X", "95", "fb_account"),  # excluded by regex
        _raw_row("ASSO MANUAL", None, "no_fb_account"),  # via assos_to_add
    ]
    df = spark.createDataFrame(rows, RAW_COLS)
    Table(spark, "crm", "associations_raw", wh).write(df)
    av = spark.createDataFrame(
        [("Asso Old", "2026-01-01")], "titre string, d string"
    ).select(F.col("titre"), F.to_date("d").alias("date_upload"))
    Table(spark, "crm", "associations_validation", wh).write(av)


def _sheet(spark, tmp_path, name, csv_text):
    store = CsvSheetStore(spark, str(tmp_path / "sheets"))
    import os

    os.makedirs(store.root, exist_ok=True)
    with open(store._path(name), "w") as f:
        f.write(csv_text)
    return store


def test_assos_to_sheet_golden(spark, tmp_path):
    wh = str(tmp_path / "wh")
    _setup_raw(spark, wh)
    sheets = _sheet(spark, tmp_path, "assos_to_add", "titre\nASSO MANUAL\n")
    cfg = ValidationConfig(today="2026-01-02")

    out = assos_to_sheet(spark, wh, sheets, cfg)
    rows = {r.titre: r for r in out.collect()}

    # banded candidates kept, no_fb_account dropped unless manually added,
    # validated (upper-cased compare) and LYCEE-regex rows excluded
    assert set(rows) == {"ASSO ROCK", "ASSO SOFT", "ASSO MANUAL"}
    assert rows["ASSO ROCK"].fb_validation == "yes"
    assert rows["ASSO SOFT"].fb_validation == ""
    # ^75|PARIS postal forces acheminement 'Paris'; address is title-cased
    # with Python str.title() semantics (apostrophe starts a new word)
    assert rows["ASSO ROCK"].combined_address == "5 Rue De L'Eglise, 75010, Paris"
    # synthesized deterministic index over the output sort key
    assert [r["index"] for r in sorted(rows.values(), key=lambda r: r.titre)] == [
        0, 1, 2,
    ]
    assert sheets.exists("fb_check_upload")


def test_validation_retreatment_golden(spark, tmp_path):
    wh = str(tmp_path / "wh")
    _setup_raw(spark, wh)
    sheets = CsvSheetStore(spark, str(tmp_path / "sheets"))
    import os

    os.makedirs(sheets.root, exist_ok=True)
    header = (
        "titre;Facebook_new_URL;fb_validation;combined_address;main_category;"
        "main_type;Objet_Social;objet;date_extract;adrs_codepostal;Facebook_ID;index"
    )
    with open(sheets._path("fb_check_upload"), "w") as f:
        f.write(
            "\n".join(
                [
                    header,
                    # validated by the human: main_category filled
                    "asso rock;fb.com/r;yes;Addr R;Musique;Type;OS;obj text;"
                    "2026-01-01T00:00;75010xx;99;0",
                    # rejected: fb_validation 'no' -> saved, not exported
                    "asso soft;fb.com/s;no;Addr S;;;OS;obj;2026-01-01;75011;98;1",
                    # untouched row: dropped entirely
                    "asso idle;fb.com/i;;Addr I;;;OS;obj;2026-01-01;75012;97;2",
                    # validated but bad postal code -> filtered at the end
                    "asso far;fb.com/f;yes;Addr F;Sport;Type;OS;obj;2026-01-01;93000;96;3",
                ]
            )
        )
    with open(sheets._path("association_validated"), "w") as f:
        f.write(
            "titre;main_category;main_type;Facebook_new_URL;Objet_Social;"
            "combined_address;date_upload;date_extract;objet;coordinates;"
            "Lattitude;Longitude;adrs_codepostal;arrondissement;Facebook_ID\n"
            "Asso Rock;OldCat;T;old;OS;A;2025-12-01;2025-12-01;o;1,2;1;2;75010;Paris 10;99\n"
            "Asso Past;PastCat;T;p;OS;A;2025-12-01;2025-12-01;o;3,4;3;4;75011;Paris 11;90\n"
        )
    with open(sheets._path("assos_to_remove"), "w") as f:
        f.write("titre\nasso gone\n")

    def geocode():
        return lambda addr: "48.85,2.35"

    cfg = ValidationConfig(today="2026-01-02")
    out_csv = str(tmp_path / "assos_to_create.csv")
    merged = validation_retreatment(spark, wh, sheets, geocode, out_csv, cfg)
    rows = {r.titre: r for r in merged.collect()}

    # keep-last dedup: fresh 'Asso Rock' beats the past snapshot row
    assert rows["Asso Rock"].main_category == "Musique"
    assert rows["Asso Rock"].coordinates == "48.85,2.35"
    assert rows["Asso Rock"].Lattitude == "48.85"
    assert rows["Asso Rock"].arrondissement == "Paris 10"
    # past-only row survives the merge
    assert rows["Asso Past"].main_category == "PastCat"
    # 'no' validation and untouched rows are not exported; bad postal gone
    assert set(rows) == {"Asso Rock", "Asso Past"}

    # the partition write captured validated AND rejected rows
    av = Table(spark, "crm", "associations_validation", wh).read()
    saved = {r.titre: r for r in av.filter(F.col("date_upload").isNotNull()).collect()}
    assert set(saved) == {"Asso Rock", "Asso Soft", "Asso Far"}
    # [:5] postal truncation and capitalize() on objet
    assert saved["Asso Rock"].adrs_codepostal == "75010"
    assert saved["Asso Rock"].objet == "Obj text"

    with open(out_csv) as f:
        assert "Asso Rock" in f.read()


def test_update_assos_golden(spark, tmp_path):
    wh = str(tmp_path / "wh")
    df = spark.createDataFrame(
        [
            ("Asso Rock", 21, None, "about rock", "yes",
             "7 Rue A, Quartier B, Paris, Île-de-France, France métropolitaine, 75010, France",
             None, "f.png", "u.png", "https://cdn.x/a/b-rockimg.jpg", "C", "F", 5, "service"),
            ("Asso User", 22, None, "about user", "maybe no",
             "8 Rue B, Secteur C, 75011, France",
             None, "f.png", "u.png", "pic.png", "C", "F", 0, "service"),
            ("Asso Event", 23, None, "x", "no", "addr", None, "f", "u", "g", "C", "F", 1,
             "event"),  # wrong listing type
            ("Asso Null", 24, None, "about null", "maybe no",
             "Unparseable Address Without Commas",
             None, "f.png", "u.png", "g.png", "C", "F", None, "service"),
        ],
        "Title string, product_id long, _dates_event_user string, Content string, "
        "_wp_import string, _address string, _friendly_address string, "
        "Image_Featured string, Image_URL string, _gallery_unserialized string, "
        "Categories string, Features string, Author_ID long, _listing_type string",
    )
    Table(spark, "crm", "wp_export_associations", wh).write(df)
    create_csv = str(tmp_path / "create.csv")
    with open(create_csv, "w") as f:
        f.write("titre;x\nAsso Rock;1\nAsso New;2\n")

    cfg = ValidationConfig(today="2026-01-02")
    users = update_assos(
        spark, wh, create_csv, str(tmp_path / "upd.csv"), str(tmp_path / "uu.csv"), cfg
    )
    rows = {r.Titre: r for r in users.collect()}

    # 'yes'-flagged (flag 'no') goes to the update CSV; 'no'-containing
    # rows form the user feed
    with open(str(tmp_path / "upd.csv")) as f:
        upd = f.read()
    assert "Asso Rock" in upd and "Asso New" not in upd

    assert set(rows) == {"Asso User", "Asso Null"}
    u = rows["Asso User"]
    # street = first two comma groups; postcode = last group after removals
    # (reference quirk: '.*,(.*)$' keeps the leading space -> double space)
    assert u._friendly_address == "8 Rue B, Secteur C,  75011, Paris"
    # author_id 0 -> _verified stays null (the reference's isin([0]) guard)
    assert u._verified is None
    assert u.seo_metadescription == "about user"
    assert u._gallery_unserialized == "pic"
    n = rows["Asso Null"]
    # pandas parity: str.extract NaN on no match -> _friendly_address stays
    # null (no fabricated ', , Paris'); null author_id: isin([0])==False is
    # True in pandas -> 'on'
    assert n._friendly_address is None
    assert n._verified == "on"


def test_title_case_matches_python(spark):
    samples = [
        "5 rue de l'eglise, 75010, paris",
        "ASSO ROCK",
        "mixed-CASE d'été 42x",
        "",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = [r.t for r in df.select(title_case(F.col("s")).alias("t")).collect()]
    assert got == [s.title() for s in samples]
