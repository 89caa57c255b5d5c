"""Unit tests for the extraction contract (SURVEY.md §2.3 T1-T7) — pure
Python, no Spark.  Regex parity cases mirror the reference cleaner
(slice_extractor.py:62,212-225)."""

from document_processor_spark import contract as C


class TestGlyphClean:
    def test_font_form(self):
        assert C.clean_text("a glyph<c=12,font=/AB12+Foo-Bar> b") == "a b"

    def test_numeric_form(self):
        assert C.clean_text("a glyph<123> b") == "a b"

    def test_case_insensitive(self):
        assert C.clean_text("GLYPH<c=1,font=/A1+F-G> x GLyPh<9>") == "x"

    def test_adjacent_to_words(self):
        assert C.clean_text("wordglyph<1>end") == "word end"

    def test_tab_and_space_collapse(self):
        assert C.clean_text("a\t\tb   c \t d") == "a b c d"

    def test_newlines_preserved(self):
        # the reference cleaner only collapses [ \t]+ — newlines survive
        assert C.clean_text("a\nb") == "a\nb"
        assert C.clean_text(" a \n b ") == "a \n b"

    def test_strip_all_whitespace_ends(self):
        assert C.clean_text("\t x \t") == "x"

    def test_not_a_glyph(self):
        # malformed tokens must NOT be removed
        assert C.clean_text("glyph<c=x,font=/A+B>") == "glyph<c=x,font=/A+B>"
        assert C.clean_text("glyph<>") == "glyph<>"

    def test_empty_and_ws_only(self):
        assert C.clean_text("") == ""
        assert C.clean_text(" \t ") == ""
        assert C.clean_text("glyph<1>\tglyph<2>") == ""


class TestClassify:
    def test_markers(self):
        assert C.classify_textual("H1: title") == "heading"
        assert C.classify_textual("H2: sub") == "heading"
        assert C.classify_textual("body text H1:") == "paragraph"


class TestScanDecode:
    def test_roundtrip(self):
        import base64
        payload = "scan:" + base64.b64encode("Héllo wörld".encode()).decode()
        assert C.decode_scan(payload) == "Héllo wörld"

    def test_bad_prefix(self):
        assert C.decode_scan("notscan:abc") is None

    def test_invalid_chars(self):
        assert C.decode_scan("scan:!!not base64!!") is None

    def test_empty_body(self):
        assert C.decode_scan("scan:") == ""


class TestTableFlatten:
    def test_basic(self):
        assert C.flatten_table("h1\th2\nv1\tv2") == "h1\th2\nv1\tv2"

    def test_cell_cleaning(self):
        assert C.flatten_table("a glyph<1>\tb\nc\td  e") == "a\tb\nc\td e"

    def test_empty_cells_preserved(self):
        assert C.flatten_table("a\t\tb\n\t\t") == "a\t\tb\n\t\t"

    def test_trailing_empty_cell(self):
        assert C.flatten_table("a\t") == "a\t"


class TestHtml:
    def test_strip_tags_spaces(self):
        assert C.clean_text(C.strip_tags("<p>a<b>b</b>c</p>")) == "a b c"

    def test_heading_detect(self):
        assert C.html_is_heading("<h2 class='x'>t</h2>")
        assert C.html_is_heading("  <H1>t</H1>")
        assert not C.html_is_heading("<p>h1 text</p>")
        assert not C.html_is_heading("<hr>")

    def test_boilerplate_density(self):
        nav = '<nav><a href="/h">Home</a><a href="/a">About</a></nav>'
        cleaned = C.clean_text(C.strip_tags(nav))
        assert C.html_density(nav, len(cleaned)) < C.HTML_DENSITY_THRESHOLD
        para = "<p>" + "real content words here " * 5 + "</p>"
        cleaned = C.clean_text(C.strip_tags(para))
        assert C.html_density(para, len(cleaned)) >= C.HTML_DENSITY_THRESHOLD


class TestOffset:
    def test_split(self):
        assert C.split_offset(30_005) == (3, 5)
        assert C.split_offset(0) == (0, 0)
        assert C.split_offset(9_999) == (0, 9_999)
