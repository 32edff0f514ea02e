"""S6 LaTeX sink: xtable-style emitter over the committed simulation
results (reference simulation.R:445-581)."""

import pandas as pd
import pytest

from mrt_data_integration_spark.report import (
    print_exact_number_nicely,
    xtable_simulation_results,
)

PAPER_METHODS = (
    "WCLS-Internal",
    "WCLS-Pooled",
    "P-WCLS-Internal",
    "P-WCLS-Pooled",
    "ET-WCLS",
    "DR-WCLS",
    "PET-WCLS",
)


@pytest.fixture(scope="module")
def summary():
    return pd.read_csv("results/simulation_results.csv")


def test_number_formatting():
    # simulation.R:445-453
    assert print_exact_number_nicely(-2.0) == "-2"
    assert print_exact_number_nicely(5.0) == "5"
    assert print_exact_number_nicely(1.25) == "1.2"
    assert print_exact_number_nicely(1.5000000001) == "1.5"


def test_paper_table_emitted_lines(summary):
    """Pin the emitted lines for the n=400 paper table
    (make_table(400, method_vector=table_method_names))."""
    tbl = xtable_simulation_results(summary, 400, method_vector=PAPER_METHODS)
    lines = tbl.splitlines()

    assert lines[0] == "\\begin{table*}"
    assert lines[1] == "\\centering"
    assert lines[2] == "\\begin{tabular}{lllllll}"
    assert lines[3] == "  \\hline"
    # two-row multirow header, underline moved BELOW the spacer row by the
    # post-print munge (simulation.R:568-570)
    assert lines[4].startswith(
        "  \\multirow{2}{*}{\\parbox{1pt}{Coefficient name}} & "
    )
    assert lines[4].rstrip().endswith("\\parbox{40pt}{Coverage}} \\\\")
    # the removed \hline's indent merges into the spacer row, exactly as
    # the reference's str_replace leaves it
    assert lines[5] == "     &  &  &  &  &  &  \\\\"
    assert lines[6] == "\\hline"

    # Intercept block: multirow label on the first row only
    assert lines[7].startswith("  \\multirow{10}{*}{Intercept} & -2 & WCLS-Internal")
    assert lines[8].startswith("   & -2 & WCLS-Pooled")
    # \hline inserted before the Slope block (simulation.R:571)
    islope = lines.index(" \\hline ")
    assert lines[islope + 1].startswith("  \\multirow{10}{*}{Slope} & 5 & WCLS-Internal")

    # method display order is METHOD_ORDER filtered (dplyr::filter keeps
    # original order), 7 methods per coefficient block
    methods = [ln.split(" & ")[2] for ln in lines[7:14]]
    assert methods == list(PAPER_METHODS)
    assert len([ln for ln in lines if " & " in ln and "parbox" not in ln]) == 15

    # WCLS-Pooled rel-eff is N/A (simulation.R:472)
    pooled = lines[8].split(" & ")
    assert pooled[4] == "N/A"

    # boldface semantics on the committed values: PET-WCLS is best
    # rel-eff and best rMSE for both coefficients (the paper's headline)
    for block_start in (7, islope + 1):
        pet = next(
            ln for ln in lines[block_start : block_start + 7] if "PET-WCLS" in ln
        )
        cells = pet.split(" & ")
        assert cells[4].startswith("\\textbf{") and cells[4].endswith("\\%}")
        assert cells[5].startswith("\\textbf{")

    # coverage within 3*sqrt(.05*.95/400) of 95% is bold; WCLS-Pooled's
    # biased ~58% coverage must NOT be
    assert "\\textbf" not in lines[8].split(" & ")[6]
    assert lines[7].split(" & ")[6].startswith("\\textbf{")

    assert lines[-1] == "\\end{table*}"
    assert "\\label{integration:tab:simulation_results}" in tbl
    assert "``Avg estimate''" in tbl  # caption text (simulation.R:557-566)


def test_rel_eff_direction_and_rounding(summary):
    """Display rel-eff is ref_se/method_se from 3-digit-rounded SEs
    (simulation.R:132, :173)."""
    tbl = xtable_simulation_results(summary, 400, method_vector=PAPER_METHODS)
    sub = summary[
        (summary.n_internal == 400)
        & (summary.n_external == 400)
        & (summary.coef == "Intercept")
    ].set_index("method")["empirical_se"].round(3)
    expected = round(sub["WCLS-Internal"] / sub["PET-WCLS"], 3)
    line = next(
        ln for ln in tbl.splitlines() if "PET-WCLS" in ln and "Intercept" not in ln
    )
    shown = line.split(" & ")[4]
    assert shown == "\\textbf{" + f"{expected * 100:.1f}" + "\\%}"


def test_method_vector_without_internal_still_resolves_ref(summary):
    """The rel-eff reference (WCLS-Internal SE) must resolve even when
    method_vector omits WCLS-Internal — it is looked up before the
    method filter, not after (r2 ADVICE: this used to KeyError)."""
    tbl = xtable_simulation_results(
        summary, 400, method_vector=("ET-WCLS", "DR-WCLS")
    )
    assert "ET-WCLS" in tbl and "WCLS-Internal" not in tbl


def test_missing_internal_reference_is_descriptive(summary):
    """A summary with no WCLS-Internal rows raises a clear ValueError,
    not a KeyError from the ref lookup."""
    gutted = summary[summary["method"] != "WCLS-Internal"]
    with pytest.raises(ValueError, match="WCLS-Internal"):
        xtable_simulation_results(gutted, 400, method_vector=("ET-WCLS",))


def test_all_grid_sizes_emit(summary):
    # make_table(25) ... make_table(6400) with the full 10-method vector
    for n in sorted(summary.n_internal.unique()):
        sub = summary[(summary.n_internal == n) & (summary.n_external == n)]
        if sub.empty:
            continue
        tbl = xtable_simulation_results(summary, int(n))
        assert tbl.count("\\multirow{10}{*}{") == 2
        assert tbl.count("\\textbf{") >= 2


def test_se_lineplot_spec_structure():
    import pandas as pd

    from mrt_data_integration_spark.report import se_lineplot_spec

    pdf = pd.DataFrame(
        {
            "method": ["A", "A", "B", "B", "A"],
            "coef": ["Intercept"] * 4 + ["Slope"],
            "n_internal": [100, 100, 100, 100, 400],
            "n_external": [25, 400, 25, 400, 100],
            "empirical_se": [1.5, 0.8, 2.0, 1.1, 0.9],
        }
    )
    spec = se_lineplot_spec(pdf, fixed_side="internal")
    assert spec["$schema"].endswith("vega-lite/v5.json")
    # only n_internal == 100 rows survive, sorted (coef, method, n)
    vals = spec["data"]["values"]
    assert len(vals) == 4
    assert [v["n"] for v in vals] == [25, 400, 25, 400]
    enc = spec["spec"]["encoding"]
    assert enc["x"]["scale"]["type"] == "log" and enc["y"]["scale"]["type"] == "log"
    assert spec["facet"]["field"] == "coef"
    # the flipped variant pins the other side
    spec2 = se_lineplot_spec(pdf, fixed_side="external")
    assert [v["n"] for v in spec2["data"]["values"]] == [400]


def test_error_boxplot_spec_excludes_equal_and_centers():
    import pandas as pd

    from mrt_data_integration_spark.report import error_boxplot_spec

    pdf = pd.DataFrame(
        {
            "method": ["WCLS-Pooled", "ET-WCLS-Equal", "WCLS-Pooled"],
            "coef": ["Intercept", "Intercept", "Slope"],
            "estimate": [-1.5, 99.0, 5.5],
        }
    )
    spec = error_boxplot_spec(pdf, {"Intercept": -2.0, "Slope": 5.0})
    vals = spec["data"]["values"]
    assert all(v["method"] != "ET-WCLS-Equal" for v in vals)  # simulation.R:416
    errs = {(v["coef"]): v["error"] for v in vals}
    assert abs(errs["Intercept"] - 0.5) < 1e-12
    assert abs(errs["Slope"] - 0.5) < 1e-12
    assert spec["mark"]["type"] == "boxplot"
    assert spec["encoding"]["xOffset"]["field"] == "method"


def test_write_figure_is_byte_stable(tmp_path):
    from mrt_data_integration_spark.report import write_figure

    spec = {"b": 1, "a": {"y": [3, 2], "x": None}}
    p1 = write_figure(spec, str(tmp_path / "f1.vl.json"))
    p2 = write_figure(spec, str(tmp_path / "f2.vl.json"))
    b1, b2 = open(p1, "rb").read(), open(p2, "rb").read()
    assert b1 == b2 and b1.startswith(b"{")


def test_estimator_report_pivot_roundtrip(spark, sf_smoke):
    """The retired `estimator_report_pivot` driver query (see
    _NO_ORACLE_RETIREES in tests/test_window_policy.py): the pivot
    must round-trip back to the exact long (method, coef, label) set
    computed from the fits themselves — pinning the reshape machinery
    the driver row used to cover (its inverse, `unpivot_long`, keeps a
    CORE hash-oracle slot)."""
    from pyspark.sql import functions as F

    from mrt_data_integration_spark.estimators.pwcls import pwcls
    from mrt_data_integration_spark.estimators.wcls import wcls
    from mrt_data_integration_spark.queries import QUERIES
    from mrt_data_integration_spark.queries.estimators import (
        _mrt_panel,
        _std_designs,
    )

    piv = QUERIES["estimator_report_pivot"](spark, sf_smoke)
    methods = [c for c in piv.columns if c != "coef"]
    assert methods == ["pwcls_pooled", "wcls_pooled"]
    # unpivot the pivot back to long
    back = {
        (r.method, r.coef, r.label)
        for r in piv.select(
            "coef",
            F.expr(
                "stack(2, 'pwcls_pooled', pwcls_pooled, "
                "'wcls_pooled', wcls_pooled) AS (method, label)"
            ),
        ).collect()
    }
    # the long set straight from the fits
    x_h, mods, s_mods, _ = _std_designs()
    panel = _mrt_panel(spark, sf_smoke)
    expected = set()
    for method, fit in (
        ("wcls_pooled", wcls(panel, x_h=x_h, moderators=mods, p_target=None)),
        (
            "pwcls_pooled",
            pwcls(panel, x_h=x_h, s_moderators=s_mods, r_moderators=mods),
        ),
    ):
        for name, b, s in zip(fit.r_names, fit.beta_r, fit.se_beta_r):
            expected.add((method, name, "%.3f (%.3f)" % (b, s)))
    assert back == expected
