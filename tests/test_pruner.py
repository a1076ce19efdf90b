"""Content-pruner tests — invariants from src/tests/content-pruner.test.ts."""

from webpeel_spark.pure.pruner import prune_content, prune_markdown


def _article(paragraphs=6, words=30):
    body = "".join(
        f"<p>{' '.join(['content'] * words)} paragraph {i}.</p>" for i in range(paragraphs)
    )
    return body


class TestSemanticPass:
    def test_removes_chrome_tags(self):
        html = f"<html><body><nav>NAV LINKS</nav><article>{_article()}</article><footer>FOOT</footer></body></html>"
        r = prune_content(html)
        assert "NAV LINKS" not in r.html
        assert "FOOT" not in r.html
        assert "paragraph 0" in r.html
        assert r.nodes_removed >= 2

    def test_removes_chrome_classes(self):
        html = (
            "<html><body>"
            '<div class="cookie-consent">cookies</div>'
            '<div class="sidebar">side</div>'
            f"<article>{_article()}</article></body></html>"
        )
        r = prune_content(html)
        assert "cookies" not in r.html
        assert "side" not in r.html

    def test_content_patterns_protect(self):
        html = (
            "<html><body>"
            f'<div class="post-content sidebar">{_article(3)}</div>'
            "</body></html>"
        )
        r = prune_content(html)
        # post-content matches CONTENT_PATTERNS → protected despite "sidebar"
        assert "paragraph 0" in r.html

    def test_protected_tags_recursed_not_removed(self):
        html = (
            f"<html><body><main><nav>INNER NAV</nav><article>{_article()}</article></main>"
            "</body></html>"
        )
        r = prune_content(html)
        assert "INNER NAV" not in r.html
        assert "paragraph 0" in r.html


class TestRegexPrePass:
    def test_large_doc_nav_stripped_by_regex(self):
        filler = _article(paragraphs=60, words=60)
        html = f"<html><body><nav>BIGNAV</nav><article>{filler}</article></body></html>"
        assert len(html) > 20000
        r = prune_content(html)
        assert "BIGNAV" not in r.html


class TestDensityPass:
    def test_removes_low_density_blocks(self):
        links = "".join(f'<a href="/l{i}">l{i}</a> ' for i in range(40))
        html = (
            f"<html><body><article>{_article(8, 40)}</article>"
            f"<div>{links}</div></body></html>"
        )
        r = prune_content(html)
        assert "paragraph 0" in r.html

    def test_density_safe_tags_survive(self):
        html = (
            "<html><body><article><h2>Tiny</h2>"
            f"{_article(5)}</article></body></html>"
        )
        r = prune_content(html)
        assert "Tiny" in r.html

    def test_retention_floor(self):
        html = f"<html><body><article>{_article(4)}</article></body></html>"
        r = prune_content(html)
        assert len(r.html) >= len(html) * 0.3

    def test_empty_input(self):
        r = prune_content("")
        assert r.html == "" and r.nodes_removed == 0


class TestPruneMarkdown:
    def test_button_labels_removed(self):
        md = "real line\nLoad More\nShow More\nanother real line"
        out = prune_markdown(md)
        assert "Load More" not in out
        assert "real line" in out

    def test_empty_images_removed(self):
        md = "keep\n![](https://x.com/i.png)\n![alt](https://x.com/j.png)"
        out = prune_markdown(md)
        assert "![](" not in out
        assert "![alt](" in out

    def test_consecutive_hr_collapsed(self):
        md = "a\n* * *\n* * *\n---\nb"
        out = prune_markdown(md)
        assert out.count("* * *") == 1
        assert "---" not in out

    def test_empty_input(self):
        assert prune_markdown("") == ""
