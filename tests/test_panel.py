"""Control-panel layer: progress callback discipline + result table
(terminal twin of reference interface.py:40-209)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from etl_transparencia_sergipe_spark.config import JobConfig
from etl_transparencia_sergipe_spark.panel import main, run_with_progress


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="panel_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_run_with_progress_end_to_end(spark, tmpdir):
    calls: list[tuple[float, str]] = []

    cfg = JobConfig(cidades=["aracaju", "pacatuba"], anos=[2024],
                    meses=[1, 2])
    out = os.path.join(tmpdir, "processed")
    summary = run_with_progress(
        spark, cfg, out, lambda f, m, eta: calls.append((f, m)))

    rows = summary.collect()
    assert {(r.cidade, r.ano) for r in rows} \
        == {("aracaju", 2024), ("pacatuba", 2024)}
    assert {r.mes for r in rows} == {1, 2}
    assert all(r.n_rows > 0 and r.total_pago is not None for r in rows)
    # progress ends at 1.0 and the observe-metric row count is reported
    assert calls and calls[-1][0] == 1.0
    assert any("rows written" in m for _, m in calls)
    total_rows = sum(r.n_rows for r in rows)
    assert f"{total_rows} rows written" in calls[-1][1]


def test_unknown_cities_complete_without_output(spark, tmpdir):
    calls = []
    cfg = JobConfig(cidades=["atlantis"], anos=[2024])
    summary = run_with_progress(
        spark, cfg, os.path.join(tmpdir, "x"),
        lambda f, m, eta: calls.append((f, m)))
    assert summary.count() == 0
    assert calls[-1][0] == 1.0  # completes, does not raise (main.py:61-64)


def test_cli_renders_table(spark, tmpdir, capsys):
    out = os.path.join(tmpdir, "processed")
    cfg_json = '{"cidades": ["aracaju"], "anos": [2024], "meses": [1]}'
    rc = main(["--config", cfg_json, "--out", out])
    assert rc == 0
    stdout = capsys.readouterr().out
    assert "cidade" in stdout and "aracaju" in stdout


def test_streamlit_layer_is_import_gated():
    try:
        import streamlit  # noqa: F401
    except ImportError:
        pass
    else:
        pytest.skip("streamlit installed — the import gate has nothing "
                    "to prove here")
    with pytest.raises(ImportError):
        from etl_transparencia_sergipe_spark.panel import streamlit_app
        streamlit_app()


def test_streamlit_widgets_smoke(tmpdir):
    """Execute the widget layer via streamlit's own test harness
    (AppTest) where streamlit is installed: widgets render, a run
    triggered through the button produces the result dataframe. Skipped
    in this container (no streamlit) — the import-gate test above covers
    the no-streamlit path; this one exists so the widget code is
    actually executed in any environment that has the dependency.
    """
    st_testing = pytest.importorskip("streamlit.testing.v1")

    script = (
        "from etl_transparencia_sergipe_spark.panel import streamlit_app\n"
        "streamlit_app()\n"
    )
    at = st_testing.AppTest.from_string(script, default_timeout=120)
    at.run()
    assert not at.exception
    assert at.title[0].value.startswith("Transparência Sergipe")
    assert len(at.multiselect) == 3  # cidades / anos / meses
    # drive an actual run through the button path
    at.text_input[0].set_value(os.path.join(str(tmpdir), "out")).run()
    at.button[0].click().run(timeout=300)
    assert not at.exception
    assert len(at.dataframe) == 1
