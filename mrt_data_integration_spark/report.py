"""LaTeX results-table sink (S6): an xtable-compatible emitter for the
Monte-Carlo simulation summary, matching the reference's ``make_table``
(reference simulation.R:445-581 — formatting at :455-533, xtable print +
post-print string munging at :553-572).

This is a pure driver-side formatter: its input is the tiny per
(method, coef) summary frame (``mc_summary`` output collected to pandas,
or the committed ``results/simulation_results.csv``), never row-level
data — a table of ~20 rows regardless of corpus size, so there is no
distributed concern here by construction.

Parity notes vs the reference:
- Display relative efficiency is ref_se / method_se (simulation.R:132),
  recomputed here from ``empirical_se`` because the engine's
  ``mc_summary`` column ``rel_efficiency`` stores the inverse ratio
  (method/ref) for the driver-oracle query.
- All numeric columns are rounded to 3 digits BEFORE formatting and
  before the boldface comparisons (simulation.R:173 ``round(coef_table,
  digits=3)``), so boldface decisions replicate the reference's
  rounded-value comparisons exactly.
- The ``\\multirow{10}{*}`` coefficient label and the Slope-block
  ``\\hline`` munge hardcode "10" exactly as the reference does
  (simulation.R:509, :571) even when ``method_vector`` selects fewer
  methods — a faithful quirk, kept deliberately.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import pandas as pd

# Display order is the reference's method_names vector (simulation.R:27);
# filtering preserves THIS order, not the order of method_vector
# (dplyr::filter keeps original row order, simulation.R:456-460).
METHOD_ORDER = (
    "WCLS-Internal",
    "WCLS-Pooled",
    "P-WCLS-Internal",
    "P-WCLS-Pooled",
    "P-WCLS-Pooled-Obs",
    "ET-WCLS-Equal",
    "ET-WCLS-Kron",
    "ET-WCLS",
    "DR-WCLS",
    "PET-WCLS",
)

COEF_ORDER = ("Intercept", "Slope")

# simulation.R:542-551 — two-row header via multirow/parbox.
HEADER_CELLS = (
    "\\multirow{2}{*}{\\parbox{1pt}{Coefficient name}}",
    "\\multirow{2}{*}{\\parbox{25pt}{True value}}",
    "\\multirow{2}{*}{\\parbox{1pt}{Method}}",
    "\\multirow{2}{*}{\\parbox{42pt}{Avg\\\\estimate}}",
    "\\multirow{2}{*}{\\parbox{48pt}{Relative\\\\efficiency}}",
    "\\multirow{2}{*}{\\parbox{28pt}{rMSE}}",
    "\\multirow{2}{*}{\\parbox{40pt}{Coverage}}",
)


def print_exact_number_nicely(x: float, digits: int = 1) -> str:
    """simulation.R:445-453 — integers print bare, else one decimal."""
    x_rounded = round(x)
    if abs(x - x_rounded) < 1e-6:
        return str(int(x_rounded))
    return _r_num(round(x, digits))


def _r_num(x: float) -> str:
    """Render a float the way R's as.character does for simple decimals
    (no trailing zeros: 1.5 -> "1.5", 2.0 -> "2")."""
    if x == int(x):
        return str(int(x))
    return repr(x)


def _label_percent(x: float) -> str:
    """scales::label_percent(accuracy=0.1) then the sanitize step's
    '%' -> '\\%' (simulation.R:467-468, :566)."""
    return f"{x * 100:.1f}\\%"


def _bold(s: str) -> str:
    return "\\textbf{" + s + "}"


def xtable_simulation_results(
    summary: pd.DataFrame,
    table_sample_size: int,
    method_vector: Sequence[str] = METHOD_ORDER,
    n_replications: int = 400,
    truth: dict[str, float] | None = None,
    label: str = "integration:tab:simulation_results",
) -> str:
    """Emit the reference's simulation-results LaTeX table
    (simulation.R:455-572) for one (n_internal == n_external ==
    table_sample_size) cell of the study grid.

    ``summary`` columns: n_internal, n_external, coef, method,
    avg_estimate, empirical_se, rmse, coverage (the ``mc_summary`` /
    ``results/simulation_results.csv`` schema; extra columns ignored).
    """
    truth = truth or {"Intercept": -2.0, "Slope": 5.0}
    cell = summary[
        (summary["n_internal"] == table_sample_size)
        & (summary["n_external"] == table_sample_size)
    ].copy()
    if cell.empty:
        raise ValueError(f"no summary rows for sample size {table_sample_size}")

    # simulation.R:173 — round everything to 3 digits before formatting.
    for c in ("avg_estimate", "empirical_se", "rmse", "coverage"):
        cell[c] = cell[c].round(3)

    # Relative efficiency ref/method (simulation.R:132), from the
    # already-rounded empirical SEs as the reference's coef_table has.
    # The reference is looked up BEFORE the method_vector filter so a
    # vector omitting WCLS-Internal still resolves (or fails clearly).
    ref = cell[cell["method"] == "WCLS-Internal"].set_index("coef")["empirical_se"]
    sub = cell[cell["method"].isin(set(method_vector))].copy()
    if sub.empty:
        raise ValueError(
            f"no summary rows for methods {sorted(method_vector)} at "
            f"sample size {table_sample_size}"
        )
    missing = sorted(set(sub["coef"]) - set(ref.index))
    if missing:
        raise ValueError(
            "relative efficiency needs the WCLS-Internal reference SE, "
            f"but the summary has no WCLS-Internal rows for coef(s) "
            f"{missing} at sample size {table_sample_size}"
        )
    sub["rel_eff"] = [
        round(ref[c] / se, 3) for c, se in zip(sub["coef"], sub["empirical_se"])
    ]

    order = {m: i for i, m in enumerate(METHOD_ORDER)}
    sub = sub.sort_values(
        ["coef", "method"],
        key=lambda s: s.map(
            {c: i for i, c in enumerate(COEF_ORDER)} if s.name == "coef" else order
        ),
    ).reset_index(drop=True)

    coverage_mc_error = 3 * math.sqrt(0.05 * 0.95 / n_replications)
    rows: list[list[str]] = []
    for coef in COEF_ORDER:
        block = sub[sub["coef"] == coef]
        if block.empty:
            continue
        # Best-performance boldface targets (simulation.R:486-502):
        # max rel-eff with WCLS-Pooled's treated as 0 (N/A, :472-473),
        # min rMSE over all selected methods.
        eff_num = [
            0.0 if r.method == "WCLS-Pooled" else r.rel_eff
            for r in block.itertuples()
        ]
        best_eff = max(eff_num)
        best_rmse = block["rmse"].min()
        first = True
        for (_, r), eff in zip(block.iterrows(), eff_num):
            avg = f"{r['avg_estimate']:.2f}"
            # simulation.R:526-531 — avg estimate within 3 MC-SEs of truth.
            se_mc = r["empirical_se"] / math.sqrt(n_replications)
            if abs((r["avg_estimate"] - truth[coef]) / se_mc) < 3:
                avg = _bold(avg)
            eff_s = (
                "N/A" if r["method"] == "WCLS-Pooled" else _label_percent(r["rel_eff"])
            )
            if eff == best_eff and eff > 0:
                eff_s = _bold(eff_s)
            rmse_s = f"{r['rmse']:.2f}"
            if r["rmse"] == best_rmse:
                rmse_s = _bold(rmse_s)
            cov_s = _label_percent(r["coverage"])
            if abs(r["coverage"] - 0.95) < coverage_mc_error:
                cov_s = _bold(cov_s)
            coef_cell = "\\multirow{10}{*}{" + coef + "}" if first else ""
            first = False
            rows.append(
                [
                    coef_cell,
                    print_exact_number_nicely(truth[coef]),
                    r["method"],
                    avg,
                    eff_s,
                    rmse_s,
                    cov_s,
                ]
            )

    caption = (
        "Results from the simulation with "
        + str(table_sample_size)
        + " individuals in both the internal and external studies. "
        "For the ``Avg estimate'' and ``Coverage'' columns, the boldface "
        "indicates values within Monte Carlo error ($3\\sigma$) of the truth. "
        "For the ``Relative efficiency'' and ``rMSE'' columns, the boldface "
        "indicates the best performance for each coefficient (PET-WCLS in "
        "both cases). Relative efficiency is computed as a ratio of "
        "empirically estimated standard errors."
    )

    def line(cells: Sequence[str]) -> str:
        return "  " + " & ".join(cells) + " \\\\ \n"

    # xtable print shape (simulation.R:554-567): table* float, header row,
    # blank spacer row (rbind of "" at :552), then the data rows.
    out = (
        "\\begin{table*}\n"
        "\\centering\n"
        "\\begin{tabular}{" + "l" * 7 + "}\n"
        "  \\hline\n"
        + line(HEADER_CELLS)
        + "  \\hline\n"
        + line([""] * 7)
        + "".join(line(r) for r in rows)
        + "   \\hline\n"
        "\\end{tabular}\n"
        "\\caption{" + caption + "} \n"
        "\\label{" + label + "}\n"
        "\\end{table*}\n"
    )
    # Post-print munging (simulation.R:568-571; whitespace adapted to this
    # emitter's cell padding), each on the first match as str_replace does:
    # move the header underline below the spacer row
    # so the two-row multirow header reads as one block, then rule off
    # the Intercept block before Slope.
    out = out.replace("&  &  \\\\ \n", "&  &  \\\\\n\\hline\n", 1)
    out = out.replace("\\hline\n   &  &  ", "   &  &  ", 1)
    out = out.replace(
        "\n  \\multirow{10}{*}{Slope}", "\n \\hline \n  \\multirow{10}{*}{Slope}", 1
    )
    return out


# ---------------------------------------------------------------------------
# S5 figure sink (reference simulation.R:310-436) — emitted as Vega-Lite v5
# specs rather than rendered pixels: the engine's sink contract is a
# DETERMINISTIC, dependency-free artifact (plain JSON + embedded data
# values) that any Vega-Lite renderer turns into the reference's figures.
# Plotting libraries are deliberately not imported (none are guaranteed in
# the runtime); the Spark side computes every number that appears.

_METHOD_COLORS = {
    # stable categorical assignment (alphabetical), standing in for the
    # reference's method_colors palette (simulation.R:303-308).
    "scheme": "tableau10",
}


def se_lineplot_spec(summary_pdf, fixed_side: str = "internal") -> dict:
    """Vega-Lite spec of the reference's sample_size_se panels
    (simulation.R:310-394): Empirical Standard Error vs the varying
    sample size, log-log, one line per method, faceted by coefficient.

    ``summary_pdf``: pandas frame with columns ``method``, ``coef``,
    ``n_internal``, ``n_external``, ``empirical_se`` (the MC summary —
    simulation/harness.mc_summary output). ``fixed_side``: which side is
    pinned at 100 (the reference draws both variants).
    """
    fixed_col, x_col = (
        ("n_internal", "n_external")
        if fixed_side == "internal"
        else ("n_external", "n_internal")
    )
    sub = summary_pdf[summary_pdf[fixed_col] == 100]
    sub = sub.sort_values(["coef", "method", x_col])
    values = [
        {
            "method": r["method"],
            "coef": r["coef"],
            "n": int(r[x_col]),
            "se": float(r["empirical_se"]),
        }
        for _, r in sub.iterrows()
    ]
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "description": (
            f"Empirical SE vs {x_col} ({fixed_col}=100) — "
            "reference simulation.R:310-394"
        ),
        "data": {"values": values},
        "facet": {"field": "coef", "type": "nominal", "title": None},
        "spec": {
            "width": 220,
            "height": 180,
            "mark": {"type": "line", "point": True},
            "encoding": {
                "x": {
                    "field": "n",
                    "type": "quantitative",
                    "scale": {"type": "log"},
                    "title": x_col,
                },
                "y": {
                    "field": "se",
                    "type": "quantitative",
                    "scale": {"type": "log"},
                    "title": "Standard Error",
                },
                "color": {
                    "field": "method",
                    "type": "nominal",
                    "scale": _METHOD_COLORS,
                },
            },
        },
    }


def error_boxplot_spec(estimates_pdf, beta_r_true: dict[str, float]) -> dict:
    """Vega-Lite spec of the reference's estimates_400_400 grouped
    boxplots (simulation.R:397-436): estimation error (β̂_r − β_r) by
    coefficient, one box per method, ET-WCLS-Equal excluded (the
    reference drops it because it blows up the y-axis).

    ``estimates_pdf``: pandas frame with ``method``, ``coef``,
    ``estimate`` (one row per replication).
    """
    sub = estimates_pdf[estimates_pdf["method"] != "ET-WCLS-Equal"]
    sub = sub.sort_values(["coef", "method"])
    values = [
        {
            "method": r["method"],
            "coef": r["coef"],
            "error": float(r["estimate"]) - float(beta_r_true[r["coef"]]),
        }
        for _, r in sub.iterrows()
    ]
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "description": (
            "Estimation error boxplots at n=(400,400) — "
            "reference simulation.R:397-436"
        ),
        "data": {"values": values},
        "width": 500,
        "height": 220,
        "mark": {"type": "boxplot"},
        "encoding": {
            "x": {"field": "coef", "type": "nominal", "title": "Coefficient"},
            "y": {
                "field": "error",
                "type": "quantitative",
                "title": "Estimation Error",
            },
            "color": {
                "field": "method",
                "type": "nominal",
                "scale": _METHOD_COLORS,
            },
            "xOffset": {"field": "method"},
        },
    }


def write_figure(spec: dict, path: str) -> str:
    """The figure SINK: write a Vega-Lite spec as deterministic JSON
    (sorted keys, fixed separators — byte-stable for a given input).
    Returns the path."""
    import json

    with open(path, "w") as f:
        json.dump(spec, f, indent=1, sort_keys=True)
    return path
