"""Canonicalization unit tests — cases mirror redis_page_store_spec.rb:47-77,
redis_url_bloomfilter_spec.rb:42-90, and page_spec.rb to_absolute behavior."""

from cloud_crawler_ray import canon


def test_key_for_lowercases_and_https():
    # redis_page_store_spec.rb: https key stored/fetched as http
    assert canon.key_for("https://Www.Example.COM/A/B") == "http://www.example.com/a/b"


def test_key_for_collapses_whitespace():
    assert canon.key_for("http://x.com/a b\t c") == "http://x.com/a b c"


def test_key_for_replaces_every_https_substring():
    # Ruby gsub replaces all occurrences, even mid-path
    assert canon.key_for("https://x.com/https/page") == "http://x.com/http/page"


def test_strip_anchor_only_trailing_simple_fragment():
    assert canon.strip_anchor("http://x.com/a#sec_1") == "http://x.com/a"
    assert canon.strip_anchor("http://x.com/a#sec one") == "http://x.com/a#sec one"  # space not in class
    assert canon.strip_anchor("http://x.com/a") == "http://x.com/a"


def test_to_absolute_relative_and_base():
    assert canon.to_absolute("b", "http://x.com/dir/a") == "http://x.com/dir/b"
    assert (
        canon.to_absolute("b", "http://x.com/dir/a", base_url="http://y.com/base/")
        == "http://y.com/base/b"
    )


def test_to_absolute_empty_path_becomes_slash():
    assert canon.to_absolute("http://x.com", "http://y.com/") == "http://x.com/"


def test_to_absolute_strips_fragment():
    assert canon.to_absolute("/p#frag", "http://x.com/a") == "http://x.com/p"


def test_to_absolute_percent_roundtrip():
    assert canon.to_absolute("/a%20b", "http://x.com/") == "http://x.com/a%20b"


def test_canonical_url_composed():
    assert canon.canonical_url("HTTPS://X.com/One#frag") == "http://x.com/one"
    assert canon.canonical_url("http://x.com") == "http://x.com/"


def test_host_and_query_and_path():
    assert canon.host_of("http://A.B.com:8080/x?q=1") == "a.b.com"
    assert canon.has_query("http://x.com/a?foo=1")
    assert not canon.has_query("http://x.com/a")
    assert canon.path_of("http://x.com/a/b?q=1") == "/a/b"


def test_normalize_seed():
    assert canon.normalize_seed("http://x.com") == "http://x.com/"
    assert canon.normalize_seed("http://x.com/a") == "http://x.com/a"
