"""Recompute the golden signatures pinned in plans/queries.py
(_PINNED_SIGS) at sf0.01 and rewrite the dict in place.

Run after INTENDED changes to the layout/tableformer stubs:
    PYTHONPATH=/root/repo python tools/regen_pipeline_sigs.py
"""

from __future__ import annotations

import pathlib
import re

QUERIES_PY = pathlib.Path(__file__).resolve().parent.parent / (
    "docling_ibm_models_spark/plans/queries.py"
)
SF = "/root/testdata/sf0.01"


def main():
    from docling_ibm_models_spark.plans import queries as Q
    from docling_ibm_models_spark.session import get_spark

    spark = get_spark(master="local[8]")
    vals = {}
    for name in (
        "pipeline_layout_clusters",
        "pipeline_table_cells",
        "pipeline_reading_order",
        "pipeline_code_formula",
        "pipeline_figure_classes",
        "pipeline_doc_assembly",
    ):
        row = Q.QUERIES[name](spark, SF).collect()[0]
        vals[name] = (int(row["n_rows"]), str(row["sig"]))
        print(name, vals[name])

    # _PINNED_PROFILE: deterministic (section, n_calls, n_tables) rows
    prof_rows = Q.QUERIES["pipeline_table_profile"](spark, SF).collect()
    values = ", ".join(
        f"('{r['section']}', {int(r['n_calls'])}, {int(r['n_tables'])})"
        for r in prof_rows
    )
    profile_literal = (
        '_PINNED_PROFILE = (\n    "(VALUES "\n'
        + "".join(
            f'    "(\'{r["section"]}\', {int(r["n_calls"])}, {int(r["n_tables"])})'
            + (', "\n' if i < len(prof_rows) - 1 else '"\n')
            for i, r in enumerate(prof_rows)
        )
        + '    ") AS t(section, n_calls, n_tables)"\n)'
    )
    print("profile VALUES:", values)

    src = QUERIES_PY.read_text()
    for name, (n, sig) in vals.items():
        src = re.sub(
            rf'("{name}": )\(\d+, "[^"]*"\)',
            rf'\g<1>({n}, "{sig}")',
            src,
        )
    src = re.sub(
        r"_PINNED_PROFILE = \(\n(?:.*\n)*?\)",
        profile_literal,
        src,
        count=1,
    )
    QUERIES_PY.write_text(src)
    print("rewrote", QUERIES_PY)


if __name__ == "__main__":
    main()
