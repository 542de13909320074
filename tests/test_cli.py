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
