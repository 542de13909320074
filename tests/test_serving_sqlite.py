"""SQLite serving backend: reference-schema export, point-lookup API, and
upsert-merge equivalence with the Spark union-merge."""

import json

from pyspark.sql import functions as F


def _toy_kg(spark, shift=0.0):
    nodes = spark.createDataFrame(
        [("e1", "s-v", "i sleep", "PRP VB", "i sleep", "sleep", 3.0 + shift),
         ("e2", "s-v-o", "he drink coffee", "PRP VB NN", "he drink coffee",
          "drink", 2.0 + shift),
         ("e3", "s-v", "she run", "PRP VB", "she run", "run", 1.0 + shift)],
        "eid string, pattern string, words string, pos_tags string, "
        "skeleton_words string, verbs string, frequency double")
    edges = spark.createDataFrame(
        [("e1", "e2", "Precedence", 1.5 + shift),
         ("e1", "e2", "Conjunction", 0.5),
         ("e2", "e3", "Result", 2.0)],
        "hid string, tid string, sense string, weight double",
    ).withColumn("rid", F.sha1(F.concat_ws("$", "hid", "tid")))
    return nodes, edges


def test_export_and_lookup_surface(spark, tmp_path):
    from aser_spark.serving_sqlite import SqliteKG, export_kg_to_sqlite

    nodes, edges = _toy_kg(spark)
    db = str(tmp_path / "kg.db")
    stats = export_kg_to_sqlite(nodes, edges, db)
    assert stats == {"n_eventualities": 3, "eventuality_mass": 6.0,
                     "n_relations": 2}

    with SqliteKG(db) as kg:
        ev = kg.get_exact_match_eventuality("e2")
        assert ev["words"] == "he drink coffee" and ev["frequency"] == 2.0
        assert json.loads(ev["info"]) == {"pos_tags": "PRP VB NN"}
        # multi-fetch preserves order with None for misses
        multi = kg.get_exact_match_eventualities(["e3", "missing", "e1"])
        assert [m and m["_id"] for m in multi] == ["e3", None, "e1"]
        assert kg.get_eventualities_by_words("i sleep")[0]["_id"] == "e1"
        rel = kg.get_exact_match_relation("e1", "e2")
        assert rel["Precedence"] == 1.5 and rel["Conjunction"] == 0.5
        assert rel["Result"] == 0.0
        related = kg.get_related_eventualities("e1")
        assert len(related) == 1
        assert related[0][0]["tid"] == "e2"
        assert related[0][1]["words"] == "he drink coffee"
        assert kg.get_exact_match_relation("e9", "e1") is None


def test_incremental_upsert_matches_spark_merge(spark, tmp_path):
    """Exporting batch A then batch B into one file must equal the Spark
    union-merge (U1) of both batches — the reference's += update path."""
    from aser_spark.pipeline.graph import merge_kgs
    from aser_spark.serving_sqlite import SqliteKG, export_kg_to_sqlite

    na, ea = _toy_kg(spark)
    nb, eb = _toy_kg(spark, shift=10.0)
    db = str(tmp_path / "kg_merge.db")
    export_kg_to_sqlite(na, ea, db)
    export_kg_to_sqlite(nb, eb, db)

    merged_nodes, merged_edges = merge_kgs([na, nb], [ea, eb])
    want_freq = {r["eid"]: r["frequency"] for r in merged_nodes.collect()}
    want_w = {(r["hid"], r["tid"], r["sense"]): r["weight"]
              for r in merged_edges.collect()}
    with SqliteKG(db) as kg:
        got = kg.get_exact_match_eventualities(sorted(want_freq))
        assert {g["_id"]: g["frequency"] for g in got} == want_freq
        rel = kg.get_exact_match_relation("e1", "e2")
        assert rel["Precedence"] == want_w[("e1", "e2", "Precedence")]
        assert rel["Conjunction"] == want_w[("e1", "e2", "Conjunction")]


def test_round_trip_load(spark, tmp_path):
    from aser_spark.serving_sqlite import export_kg_to_sqlite, load_kg_from_sqlite

    nodes, edges = _toy_kg(spark)
    db = str(tmp_path / "kg_rt.db")
    export_kg_to_sqlite(nodes, edges, db)
    import os
    os.chmod(db, 0o444)  # reading a reference-produced KG.db must not write
    rn, re_ = load_kg_from_sqlite(spark, db)
    assert {(r["eid"], r["frequency"], r["words"]) for r in rn.collect()} == \
        {(r["eid"], r["frequency"], r["words"]) for r in nodes.collect()}
    wide = {(r["hid"], r["tid"]): (r["Precedence"], r["Result"])
            for r in re_.collect()}
    assert wide[("e1", "e2")] == (1.5, 0.0)
    assert wide[("e2", "e3")] == (0.0, 2.0)


def test_core_kg_export_from_pipeline(spark, tmp_path):
    """End-to-end: tiny corpus -> KG build -> core cut -> serving export."""
    from aser_spark.datagen import transcripts_df
    from aser_spark.pipeline import build_knowledge_graph, extract_graph_instances
    from aser_spark.pipeline.graph import build_core_kg
    from aser_spark.serving_sqlite import SqliteKG, export_kg_to_sqlite

    inst = extract_graph_instances(transcripts_df(spark, 30, seed=42))
    nodes, edges, _ = build_knowledge_graph(inst)
    core_nodes, core_edges = build_core_kg(nodes, edges, 2.0, 0.0)
    db = str(tmp_path / "core.db")
    stats = export_kg_to_sqlite(core_nodes, core_edges, db)
    assert stats["n_eventualities"] == core_nodes.count()
    with SqliteKG(db) as kg:
        some = core_nodes.orderBy(F.desc("frequency")).first()
        ev = kg.get_exact_match_eventuality(some["eid"])
        assert ev["words"] == some["words"]
        assert ev["frequency"] == some["frequency"]


def test_chunked_reads_and_writes_pure_sqlite(tmp_path):
    """No-Spark path: tiny chunksize forces many read/write chunks; order
    and None-placement must survive chunk boundaries, and reads must not
    require more SQL variables than the chunk allows."""
    from aser_spark.serving_sqlite import SqliteKG

    db = str(tmp_path / "chunks.db")
    with SqliteKG(db, chunksize=3) as kg:
        kg.merge_eventuality_rows(
            (f"e{i}", float(i), "s-v", "v", "w", f"w{i}", None)
            for i in range(10))
        ids = [f"e{i}" for i in range(9, -1, -1)] + ["nope", "e0"]
        got = kg.get_exact_match_eventualities(ids)
        assert [g and g["_id"] for g in got] == ids[:10] + [None, "e0"]
        # second merge pass: += applied once per row, across chunk splits
        kg.merge_eventuality_rows(
            (f"e{i}", 0.5, "s-v", "v", "w", f"w{i}", None) for i in range(10))
        assert kg.get_exact_match_eventuality("e7")["frequency"] == 7.5
        assert kg.stats()["n_eventualities"] == 10
