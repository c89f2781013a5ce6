"""HTML boilerplate-strip kernel tests (north-star DOM heuristics)."""

from service1_text_extraction_spark.kernels.html import extract_html


FULL_PAGE = """
<!DOCTYPE html>
<html><head><title>Annual Report</title>
<style>body { margin: 0 }</style>
<script>var tracker = "nav";</script></head>
<body>
<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
<header><a href="/l">Login</a></header>
<h1>Results &amp; Outlook</h1>
<p>Revenue grew strongly this year, with margins improving across
every segment &mdash; a very strong result.</p>
<p>Details appear in <a href="/app">the appendix</a>, which breaks the
figures down by region and product line.</p>
<aside><a href="/x">Related link one</a> <a href="/y">Related two</a></aside>
<div>Page 7</div>
<footer>&copy; 2026 Example Corp | <a href="/p">Privacy</a></footer>
</body></html>
"""


def test_strips_boilerplate_keeps_content():
    r = extract_html(FULL_PAGE)
    assert "Home" not in r.text  # nav container dropped
    assert "Login" not in r.text  # header dropped
    assert "Related link one" not in r.text  # aside dropped
    assert "Privacy" not in r.text  # footer dropped
    assert "tracker" not in r.text  # script raw text dropped
    assert "margin: 0" not in r.text  # style dropped
    assert "Page 7" not in r.text  # header/footer line pattern (F7)
    assert "Results & Outlook" in r.text  # entity decoded
    assert "- a very strong result" in r.text  # &mdash; -> '-' (K1)
    assert "the appendix" in r.text  # inline link inside long para kept
    assert 0.0 < r.boilerplate_ratio < 1.0


def test_link_density_drops_link_lists():
    nav_like = '<div><a href=a>One</a> <a href=b>Two</a> <a href=c>Three</a></div>'
    r = extract_html(nav_like)
    assert r.text == ""
    content = "<div>A sentence mentioning <a href=x>a link</a> amid prose text.</div>"
    r2 = extract_html(content)
    assert "a link" in r2.text


def test_spans_cover_text_exactly():
    r = extract_html("<h1>Title Here</h1><p>First para text.</p><p>Second para.</p>")
    assert [r.text[s:e] for s, e, _ in r.spans] == [
        "Title Here",
        "First para text.",
        "Second para.",
    ]
    kinds = [k for _, _, k in r.spans]
    assert kinds == ["heading", "para", "para"]


def test_plain_text_passthrough():
    r = extract_html("no tags at all, just plain prose text")
    assert r.text == "no tags at all, just plain prose text"
    assert r.boilerplate_ratio == 0.0


def test_malformed_html_tolerated():
    r = extract_html("<p>unclosed <b>bold and a stray < char</p><p>next one</p>")
    assert "stray < char" in r.text
    assert "next one" in r.text


def test_empty_and_whitespace():
    assert extract_html("").text == ""
    assert extract_html("   \n  ").text == ""
    assert extract_html("<div></div><p>  </p>").text == ""


def test_textarea_and_cdata_stripped():
    payload = (
        "<html><body><p>Real content paragraph here.</p>"
        "<textarea>raw editor text with <fake> tags</textarea>"
        "<![CDATA[ cdata payload should vanish ]]>"
        "<p>Second real paragraph.</p></body></html>"
    )
    r = extract_html(payload)
    assert "Real content paragraph here." in r.text
    assert "Second real paragraph." in r.text
    assert "raw editor" not in r.text
    assert "cdata payload" not in r.text
    assert "]]" not in r.text
