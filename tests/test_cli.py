"""End-to-end CLI smoke: gen -> build-kg (checkpointed) -> stats."""

import json


def test_cli_roundtrip(spark, tmp_path, capsys):
    from aser_spark.cli import main

    src = str(tmp_path / "transcripts")
    wd = str(tmp_path / "kg")

    main(["gen", "--n-convs", "25", "--out", src])
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["n_convs"] == 25

    main(["build-kg", "--input", src, "--workdir", wd, "--n-parts", "8"])
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["n_nodes"] > 0 and metrics["n_edges"] > 0

    main(["stats", "--workdir", wd])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_nodes"] == metrics["n_nodes"]
    assert stats["n_edges"] == metrics["n_edges"]

    # the caller-owned session must survive CLI invocations
    assert spark.sparkContext._jsc is not None
    assert spark.range(1).count() == 1


def test_cli_export_and_serve(spark, tmp_path, capsys):
    """export-sqlite writes a reference-schema KG.db from a workdir; serve
    (exercised via the server class the subcommand wraps) answers lookups
    against it."""
    import json as _json

    from aser_spark.cli import main
    from aser_spark.serving_net import ASERServingClient, ASERServingServer

    src = str(tmp_path / "transcripts")
    wd = str(tmp_path / "kg")
    db = str(tmp_path / "KG.db")
    main(["gen", "--n-convs", "20", "--out", src])
    main(["build-kg", "--input", src, "--workdir", wd, "--n-parts", "4"])
    capsys.readouterr()

    main(["export-sqlite", "--workdir", wd, "--db", db])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_eventualities"] > 0 and out["db"] == db

    with ASERServingServer(db_path=db) as srv:
        host, port = srv.address
        with ASERServingClient(host, port) as cli:
            some_eid = None
            evs = cli.extract_eventualities("i am hungry.")
            assert evs and evs[0]
            some_eid = evs[0][0]["eid"]
            row = cli.exact_match_eventuality(some_eid)
            # the generated corpus contains "i am hungry" head sentences
            assert row == "__NONE__" or row["_id"] == some_eid
