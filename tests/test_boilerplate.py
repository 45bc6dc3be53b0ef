"""Cross-group boilerplate removal (functions/boilerplate.py)."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from guac_ray.functions.boilerplate import (
    boilerplate_digests,
    flag_boilerplate,
    strip_boilerplate,
)


def _corpus() -> pd.DataFrame:
    rows = []
    # "PREAMBLE" in every one of 30 groups; "FOOTER" in 10; unique rest
    for g in range(30):
        rows.append({"g": g, "text": "PREAMBLE"})
        if g < 10:
            rows.append({"g": g, "text": "FOOTER"})
        rows.append({"g": g, "text": f"unique body {g}"})
        # same text twice within ONE group: counts once toward distinct
        rows.append({"g": g, "text": f"unique body {g}"})
    return pd.DataFrame(rows)


class TestBoilerplate:
    def test_digests_threshold_and_distinctness(self, ray_session, tmp_path):
        df = _corpus()
        ds = rd.from_pandas(df)
        # threshold 20: only PREAMBLE (30 groups); FOOTER at 10 survives
        d20 = boilerplate_digests(ds, "text", "g", min_groups=20,
                                  num_buckets=4)
        assert len(d20) == 1
        d10 = boilerplate_digests(ds, "text", "g", min_groups=10,
                                  num_buckets=4)
        assert len(d10) == 2
        # within-group repetition must NOT inflate the distinct count:
        # "unique body g" appears twice in one group only
        d2 = boilerplate_digests(ds, "text", "g", min_groups=2,
                                 num_buckets=4)
        assert len(d2) == 2

    def test_flag_and_strip_match_pandas_reference(self, ray_session):
        df = _corpus()
        ds = rd.from_pandas(df)
        counts = df.drop_duplicates().groupby("text")["g"].nunique()
        boiler = set(counts[counts >= 10].index)

        digests = boilerplate_digests(ds, "text", "g", min_groups=10,
                                      num_buckets=4)
        flagged = flag_boilerplate(ds, "text", digests).to_pandas()
        want = df["text"].isin(boiler)
        got = flagged.sort_values(["g", "text"]).reset_index(drop=True)
        exp = df.assign(is_boiler=want).sort_values(
            ["g", "text"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

        kept = strip_boilerplate(ds, "text", "g", min_groups=10,
                                 num_buckets=4).to_pandas()
        exp_kept = df[~df["text"].isin(boiler)].sort_values(
            ["g", "text"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            kept.sort_values(["g", "text"]).reset_index(drop=True),
            exp_kept, check_dtype=False)
        assert "is_boiler" not in kept.columns

    def test_nulls_and_empties_count_as_text(self, ray_session):
        t = pa.table({
            "g": pa.array(list(range(6)), type=pa.int64()),
            "text": pa.array(["", None, "", None, "x", "y"]),
        })
        ds = rd.from_arrow(t)
        # "" and None share one md5 (both scrub to b"") → 6 groups? no:
        # "" in groups {0,2}, None in {1,3} — same digest → 4 groups
        d = boilerplate_digests(ds, "text", "g", min_groups=4,
                                num_buckets=2)
        assert len(d) == 1
        kept = strip_boilerplate(ds, "text", "g", min_groups=4,
                                 num_buckets=2).to_pandas()
        assert sorted(kept["text"]) == ["x", "y"]

    def test_broadcast_cap_guard(self, ray_session):
        df = _corpus()
        ds = rd.from_pandas(df)
        with pytest.raises(ValueError, match="broadcast_cap"):
            boilerplate_digests(ds, "text", "g", min_groups=1,
                                num_buckets=4, broadcast_cap=3)


class TestStripBoilerLines:
    def test_line_level_rewrite(self, ray_session):
        from guac_ray.functions.boilerplate import strip_boiler_lines

        # "HDR" in 3 distinct docs (twice inside doc 0 — counted once,
        # but BOTH copies dropped); "FTR" in 3; unique bodies kept in order
        df = pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": ["HDR\nbody zero\nHDR\nFTR",
                     "HDR\nbody one\nFTR",
                     "HDR\nbody two\nFTR",
                     "solo line"],
        })
        got = (strip_boiler_lines(rd.from_pandas(df), "text", "doc_id",
                                  min_docs=3, num_buckets=2)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert got["text"].tolist() == ["body zero", "body one",
                                        "body two", "solo line"]
        assert got["n_dropped"].tolist() == [3, 2, 2, 0]

    def test_fully_boiler_doc_kept_empty(self, ray_session):
        from guac_ray.functions.boilerplate import strip_boiler_lines

        df = pd.DataFrame({
            "doc_id": [0, 1, 2],
            "text": ["SAME", "SAME", "SAME\nextra"],
        })
        got = (strip_boiler_lines(rd.from_pandas(df), "text", "doc_id",
                                  min_docs=3, num_buckets=2)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # no document row ever disappears; text empties instead
        assert len(got) == 3
        assert got["text"].tolist() == ["", "", "extra"]
        assert got["n_dropped"].tolist() == [1, 1, 1]

    def test_empty_lines_are_lines(self, ray_session):
        from guac_ray.functions.boilerplate import strip_boiler_lines

        df = pd.DataFrame({
            "doc_id": [0, 1, 2],
            "text": ["a\n\nb", "c\n\nd", "e\n\nf"],
        })
        got = (strip_boiler_lines(rd.from_pandas(df), "text", "doc_id",
                                  min_docs=3, num_buckets=2)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert got["text"].tolist() == ["a\nb", "c\nd", "e\nf"]
        assert got["n_dropped"].tolist() == [1, 1, 1]


class TestNullTextContract:
    def test_strip_lines_null_doc_untouched(self, ray_session):
        """NULL text contributes no lines to the count pass, so the
        rewrite must not phantom-drop an empty line from it (and must
        keep the text NULL, not silently coerce to '')."""
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.boilerplate import strip_boiler_lines

        docs = pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": ["nav\nbody one", "nav\nbody two", "nav\nbody three",
                     None]})
        out = strip_boiler_lines(
            rd.from_pandas(docs), "text", "doc_id", min_docs=3,
        ).to_pandas().sort_values("doc_id")
        assert out[out.doc_id != 4]["n_dropped"].tolist() == [1, 1, 1]
        null_row = out[out.doc_id == 4]
        assert null_row["n_dropped"].iloc[0] == 0
        assert null_row["text"].isna().iloc[0]
