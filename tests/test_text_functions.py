"""Reference string-kernel parity (M1, M2, M3/M4, M11, M12 — SURVEY §2.2,
§2.8), including the FIXTURES.md edge cases: bracketed mentions, accents,
quotes needing %22."""

from __future__ import annotations

import pyarrow as pa

from tabular_data_semantics_py_ray.functions.text import (
    entity_name,
    entity_names_batch,
    escape_quotes_uri,
    filter_by_prefix,
    is_valid_uri,
    normalize_mention,
    normalize_mentions_batch,
    strip_accents,
)


class TestNormalizeMention:
    def test_bracket_split(self):
        # kg/dbpedia.py:19-31: main text + each bracket content
        assert normalize_mention("Real Madrid (basketball)") == [
            "Real Madrid", "basketball",
        ]

    def test_short_items_dropped(self):
        # len > 2 filter (kg/dbpedia.py:29)
        assert normalize_mention("AB (of)") == []
        assert normalize_mention("ABC (de)") == ["ABC"]

    def test_no_brackets_passthrough(self):
        assert normalize_mention("Chicago Bulls") == ["Chicago Bulls"]

    def test_multiple_brackets(self):
        assert normalize_mention("Foo (bar) Baz (qux)") == ["Foo Baz", "bar", "qux"]

    def test_batch_variant(self):
        t = normalize_mentions_batch(
            pa.array(["Real Madrid (basketball)", "xy", "Bulls"])
        )
        got = list(zip(t["item"].to_pylist(), t["parent_idx"].to_pylist()))
        assert got == [("Real Madrid", 0), ("basketball", 0), ("Bulls", 2)]


class TestEntityName:
    def test_hash_wins(self):
        assert entity_name("http://ex.org/onto#Player") == "Player"

    def test_last_slash_segment(self):
        assert entity_name("http://ex.org/resource/Chicago_Bulls") == "Chicago_Bulls"

    def test_batch(self):
        out = entity_names_batch(
            pa.array(["http://ex.org/onto#Player", "http://ex.org/r/Bulls"])
        )
        assert out.to_pylist() == ["Player", "Bulls"]

    def test_batch_trailing_slash_matches_scalar(self):
        uris = ["http://ex.org/r/Bulls/", "http://ex.org/r/Bulls//"]
        out = entity_names_batch(pa.array(uris))
        assert out.to_pylist() == [entity_name(u) for u in uris] == [
            "Bulls", "Bulls"
        ]


def test_prefix_filter():
    uris = ["http://dbpedia.org/resource/X", "http://www.wikidata.org/entity/Q1",
            "http://other.org/Y"]
    assert filter_by_prefix(uris, ("http://dbpedia.org/",)) == [uris[0]]
    assert filter_by_prefix(uris, ("http://dbpedia.org/", "http://www.wikidata.org/")) == uris[:2]


def test_accent_strip_and_uri_validation():
    assert strip_accents("Café São") == "Cafe Sao"
    assert is_valid_uri("http://ex.org/resource/Caf%C3%A9")
    assert is_valid_uri("http://ex.org/resource/Café")  # ascii after NFD strip
    assert not is_valid_uri("http://ex.org/bad uri")
    assert not is_valid_uri("not-a-uri")
    assert not is_valid_uri('http://ex.org/"quoted"')


def test_valid_uris_batch_matches_scalar():
    from tabular_data_semantics_py_ray.functions.text import valid_uris_batch

    uris = [
        "http://ex.org/resource/Caf%C3%A9",
        "http://ex.org/resource/Café",      # non-ascii, valid after NFD strip
        "http://ex.org/资源",                # non-ascii, invalid after strip
        "http://ex.org/bad uri",
        "not-a-uri",
        'http://ex.org/"quoted"',
        "http://ex.org/back\\slash",
        "",
        None,
        "http://ex.org/ok",
    ]
    out = valid_uris_batch(pa.array(uris, type=pa.string())).to_pylist()
    expected = [is_valid_uri(u) if u is not None else False for u in uris]
    assert out == expected
    # all-ascii fast path (no scalar fallback rows)
    ascii_only = ["http://ex.org/a", "bad uri", "http://ex.org/b"]
    out2 = valid_uris_batch(pa.array(ascii_only)).to_pylist()
    assert out2 == [True, False, True]


def test_quote_escape():
    assert escape_quotes_uri('http://ex.org/r/He_said_"hi"') == (
        "http://ex.org/r/He_said_%22hi%22"
    )


def test_prefix_mask_batch():
    from tabular_data_semantics_py_ray.functions.text import (
        filter_by_prefix,
        prefix_mask_batch,
    )

    uris = ["http://a.org/x", "http://b.org/y", None, "http://a.org/"]
    mask = prefix_mask_batch(
        pa.array(uris, type=pa.string()), ("http://a.org/",)
    ).to_pylist()
    assert mask == [True, False, False, True]
    assert filter_by_prefix(
        [u for u in uris if u], ("http://a.org/",)
    ) == ["http://a.org/x", "http://a.org/"]


def test_cell_norm_whitelist_is_load_bearing():
    """Without the M3/M4/M5 whitelist, the rank-0 KG2 candidates would win
    the 'fast'/'slow' surfaces; with it they resolve into the primary
    namespace (the resolution the oracle checks end-to-end)."""
    import pandas as pd

    from tabular_data_semantics_py_ray import fixture_kg
    from tabular_data_semantics_py_ray.constants import ENT
    from tabular_data_semantics_py_ray.pipelines.queries_kg import (
        _cell_norm_resolution,
    )

    res = _cell_norm_resolution()
    assert res.loc[res.surface_form == "fast", "entity_uri"].item() == (
        ENT + "Fast_Entity"
    )
    # the unfiltered union WOULD prefer the kg2 uri (rank 0 < any primary)
    lex = fixture_kg.lexicon_df()
    kg2 = fixture_kg.kg2_sameas_df()
    kg2lex = lex.merge(kg2, on="entity_uri")
    assert "fast" in set(kg2lex["surface_form"])
    assert (kg2lex["kg2_uri"].str.startswith("http://kg2.")).all()


def test_bpe_ish_token_count_matches_python_re():
    """The Arrow RE2 match count equals Python re.findall on adversarial
    inputs: contractions, punctuation runs, digit runs, leading/trailing
    space, empty string."""
    import re

    import pyarrow as pa

    from tabular_data_semantics_py_ray.functions.textstats import (
        BPE_ISH_PATTERN,
        token_bpe_batch,
    )

    texts = [
        "it's a test, isn't it?!",
        "we'll we've we're I'm I'd you'd've",
        "abc123def  double  space",
        " leading and trailing ",
        "",
        "!!!...,,,",
        "word",
    ]
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = token_bpe_batch(batch)
    expected = [len(re.findall(BPE_ISH_PATTERN, t)) for t in texts]
    assert out.column("n_tokens_bpe").to_pylist() == expected
    assert out.column("n_tokens_ws").to_pylist() == [
        len(t.split(" ")) for t in texts
    ]
    # contractions split off as their own token: "it's" -> "it" + "'s"
    assert expected[0] > len(texts[0].split(" "))
