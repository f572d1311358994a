"""Figure-level parity gate against the actual reference implementation.

Runs only when a reference checkout exists (CST_REFERENCE_ROOT or
/root/reference): renders the same synthetic orbit through the reference
package (its cdflib import backed by this repo's CDF reader) and through
this framework, and requires exact color bounds, zero interior-pixel
differences, and only cell-boundary rounding elsewhere.  Measured numbers
are recorded in docs/parity.md.
"""

import os

import pytest

REFERENCE_ROOT = os.environ.get("CST_REFERENCE_ROOT", "/root/reference")


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "src")),
    reason="no reference checkout available",
)
def test_data_region_parity_vs_reference():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from tools.parity_vs_reference import measure

    summary = measure(REFERENCE_ROOT, dpi=200.0)
    assert summary["panels"] == 8
    assert summary["worst_vmin_rel_err"] == 0.0
    assert summary["worst_vmax_rel_err"] == 0.0
    assert summary["worst_interior_pixel_mismatch_frac"] == 0.0
    assert summary["worst_pixel_mismatch_frac"] <= 0.08  # cell-boundary rounding only
    assert summary["worst_mean_abs_channel_diff"] <= 2.0

    # Given-extrema scenario: the extrema passes themselves agree
    # bit-for-bit, and the figures rendered from them diff clean.
    given = summary["given_extrema"]
    assert given["extrema_value_mismatches"] == {}
    assert given["overrides_match"]
    assert given["worst_interior_pixel_mismatch_frac"] == 0.0
    assert given["worst_pixel_mismatch_frac"] <= 0.08

    # Instrument-grid figure (one row per instrument, given extrema).
    grid = summary["instrument_grid"]
    assert grid["panels"] == 8
    assert grid["worst_interior_pixel_mismatch_frac"] == 0.0
    assert grid["worst_pixel_mismatch_frac"] <= 0.08


def test_api_parity_audit_no_missing_symbols():
    """Every public reference function has an equivalent here accepting the
    same keyword surface (tools/api_parity_audit.py as a CI gate)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        import api_parity_audit
    finally:
        sys.path.pop(0)
    if not os.path.isdir(api_parity_audit.REFERENCE_ROOT):
        import pytest

        pytest.skip("reference tree not present")
    rows, missing = api_parity_audit.audit()
    assert missing == 0, [r for r in rows if "MISSING" in r.get("status", "")]
    deltas = [r for r in rows if r["status"].startswith("param delta")]
    assert not deltas, deltas


def test_api_reference_doc_is_fresh():
    """docs/api_reference.md matches the code's current public surface
    (regenerate with `python tools/gen_api_reference.py`)."""
    import pathlib
    import sys

    repo = pathlib.Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    try:
        import gen_api_reference
    finally:
        sys.path.pop(0)
    expected = gen_api_reference.generate()
    actual = (repo / "docs" / "api_reference.md").read_text()
    assert actual == expected, "docs/api_reference.md is stale; rerun tools/gen_api_reference.py"
