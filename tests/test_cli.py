"""Aggregate CLI tests: ls / populate (with failure isolation) / summarize /
sheet / drop / actions — mirroring the reference's CliRunner tests
(``/root/reference/tests/test_cli.py:12-41``)."""

from __future__ import annotations

import pytest

from bio2bel_spark import cli
from bio2bel_spark.exc import Bio2BELMissingInputError
from bio2bel_spark.sources.datasets import TFRegulonsDataset


@pytest.fixture()
def tf_inputs(tmp_path):
    raw = tmp_path / "raw.tsv"
    raw.write_text(
        "tf_hgnc_symbol\ttarget_hgnc_symbol\teffect\tscore\tpmids\n"
        "TP53\tMDM2\t1\tA\t111, 222\n"
        "TP53\tBCL2\t-1\tB\t333\n"
        "TP53\tMDM2\t1\tD\t444\n"
    )
    hgnc = tmp_path / "hgnc.tsv"
    hgnc.write_text(
        "hgnc_symbol\thgnc_id\nTP53\t11998\nMDM2\t6973\nBCL2\t990\n"
    )
    return str(raw), str(hgnc)


def test_ls_lists_sources(spark, capsys):
    assert cli.main(["ls"], spark=spark) == 0
    out = capsys.readouterr().out.split()
    for name in ("tfregulons", "biogrid", "intact", "hmdd", "go", "rhea", "pid"):
        assert name in out


def test_populate_one_then_summarize_sheet_drop(spark, tmp_path, tf_inputs, capsys):
    raw, hgnc = tf_inputs
    wh = str(tmp_path / "wh")
    rc = cli.main(
        [
            "--warehouse", wh,
            "populate", "--module", "tfregulons",
            "--input", f"tfregulons.raw={raw}",
            "--input", f"tfregulons.hgnc_map={hgnc}",
        ],
        spark=spark,
    )
    assert rc == 0
    assert "tfregulons: populated" in capsys.readouterr().out

    # 2 kept rows → 3 up + 3 down citation edges + 2 transcribedTo = 8 edges
    assert cli.main(
        ["--warehouse", wh, "summarize", "--module", "tfregulons"], spark=spark
    ) == 0
    assert "tfregulons.edges\t8" in capsys.readouterr().out

    assert cli.main(["--warehouse", wh, "sheet"], spark=spark) == 0
    sheet = capsys.readouterr().out
    assert "tfregulons\tedges\t8" in sheet
    assert "biogrid\tedges\t0" in sheet  # unpopulated datasets report zeros

    assert cli.main(["--warehouse", wh, "actions"], spark=spark) == 0
    acts = capsys.readouterr().out
    assert "tfregulons\tpopulate" in acts

    assert cli.main(
        ["--warehouse", wh, "drop", "--module", "tfregulons"], spark=spark
    ) == 0
    capsys.readouterr()
    cli.main(["--warehouse", wh, "summarize", "--module", "tfregulons"], spark=spark)
    assert "tfregulons.edges\t0" in capsys.readouterr().out


def test_populate_all_isolates_failures(spark, tmp_path, tf_inputs, capsys):
    raw, hgnc = tf_inputs
    wh = str(tmp_path / "wh2")
    rc = cli.main(
        [
            "--warehouse", wh,
            "populate",
            "--input", f"tfregulons.raw={raw}",
            "--input", f"tfregulons.hgnc_map={hgnc}",
        ],
        spark=spark,
    )
    # sources without inputs fail, tfregulons still populates
    assert rc == 1
    captured = capsys.readouterr()
    assert "tfregulons: populated" in captured.out
    assert "FAILED" in captured.err
    # failures are recorded in provenance
    cli.main(["--warehouse", wh, "actions", "--limit", "50"], spark=spark)
    acts = capsys.readouterr().out
    assert "populate_failed" in acts


def test_namespace_export_cli(spark, tmp_path, tf_inputs, capsys):
    raw, hgnc = tf_inputs
    wh = str(tmp_path / "whns")
    out = str(tmp_path / "ns")
    cli.main(
        [
            "--warehouse", wh,
            "populate", "--module", "tfregulons",
            "--input", f"tfregulons.raw={raw}",
            "--input", f"tfregulons.hgnc_map={hgnc}",
        ],
        spark=spark,
    )
    args = [
        "--warehouse", wh,
        "namespace", "--table", "tfregulons_edges",
        "--id-col", "target_id", "--name-col", "target_name",
        "--keyword", "TFTARGETS", "--out-dir", out,
    ]
    assert cli.main(args, spark=spark) == 0
    assert "TFTARGETS: written" in capsys.readouterr().out
    belns = (tmp_path / "ns" / "tftargets.belns").read_text()
    assert "[Namespace]" in belns and "MDM2|GRP" in belns
    # second export with unchanged data skips the write (md5 sidecar)
    assert cli.main(args, spark=spark) == 0
    assert "unchanged" in capsys.readouterr().out


def test_missing_required_input_raises(spark, tmp_path):
    ds = TFRegulonsDataset(spark, str(tmp_path / "wh3"))
    with pytest.raises(Bio2BELMissingInputError):
        ds.populate()


def test_input_path_env_fallback(spark, tmp_path, tf_inputs, monkeypatch):
    raw, hgnc = tf_inputs
    monkeypatch.setenv("BIO2BEL_SPARK_INPUT_TFREGULONS_RAW", raw)
    monkeypatch.setenv("BIO2BEL_SPARK_INPUT_TFREGULONS_HGNC_MAP", hgnc)
    ds = TFRegulonsDataset(spark, str(tmp_path / "wh4"))
    ds.populate()
    assert ds.count_table("edges") == 8
