from searchengines_spark.tokenizer import (
    STOPWORDS,
    extract_text,
    s_stem,
    simple_tokens,
    tokenize_full,
    tokenize_query_term,
)


def test_extract_text_deterministic_and_clean():
    html = b"<html><head><title>Hi &amp; Bye</title><style>x{}</style></head><body><p>Hello   <b>World</b></p><script>var a=1;</script></body></html>"
    out = extract_text(html)
    assert out == extract_text(html)  # pure
    assert "var a" not in out and "<" not in out
    assert "Hello World" in out and "Hi & Bye" in out


def test_stemmer_rules():
    assert s_stem("classes") == "class"
    assert s_stem("cities") == "city"
    assert s_stem("dogs") == "dog"
    assert s_stem("boss") == "boss"
    assert s_stem("bus") == "bus"
    assert s_stem("its") == "its"  # len < 4 untouched
    assert s_stem("a") == "a"


def test_tokenize_full_stopword_positions():
    toks = tokenize_full("The quick dogs and the lazy foxes")
    # stopwords hold a slot (None) -> field length includes them
    assert len(toks) == 7
    assert toks[0] is None and toks[3] is None and toks[4] is None
    assert toks[1] == "quick" and toks[2] == "dog" and toks[6] == "foxe"


def test_tokenize_query_term():
    assert tokenize_query_term("Dogs") == "dog"
    assert tokenize_query_term("the") is None


def test_simple_tokens_matches_duckdb_split():
    assert simple_tokens("a b  c") == ["a", "b", "c"]
    assert simple_tokens("") == []


def test_stopwords_frozen():
    assert "the" in STOPWORDS and len(STOPWORDS) == 33
