"""Python UDTFs (Spark 3.5+ table functions): one input row -> many
output rows, callable from SQL as a table source or LATERAL argument.

extract_links is the A-2 link-extraction operator
(scrape_pdf_links.py:12-14 semantics re-derived from SURVEY.md §2.C)
as a table function:

    spark.udtf.register("extract_links", ExtractLinks)
    spark.sql(\"\"\"
      SELECT p.doc_id, l.url
      FROM pages p, LATERAL extract_links(p.html, 'https://fsc.example.et') l
    \"\"\")

Performance note (why the hot path stays SQL): UDTFs evaluate
row-at-a-time in Python workers. The production spelling of link
extraction is the pure-SQL regexp_extract_all + explode query
(`html_link_extraction`) that never leaves the JVM; the UDTF exists
for the cases where per-row logic genuinely needs Python (a real
HTML parser, conditional fetch) and as SQL-surface coverage.

No `from __future__ import annotations` here (pandas/udtf modules
must keep real type hints — see registry float-policy notes).
"""

import re

from pyspark.sql.functions import udtf


HREF_RE = re.compile(r'href="([^"]*)"')


@udtf(returnType="url: string, is_absolute: boolean")
class ExtractLinks:
    """Yield every *.pdf href in `html`, absolutized against `base`."""

    def eval(self, html: str, base: str):
        if html is None:
            return
        for href in HREF_RE.findall(html):
            if not href.endswith(".pdf"):
                continue
            absolute = href.startswith("http")
            yield (href if absolute else base + href, absolute)
