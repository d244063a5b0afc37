"""Builds the documentation site: docs/*.md → docs/_site/*.html.

Counterpart of the reference's sphinx pipeline (``/root/reference/publish.sh``,
``docs/conf.py``) without the sphinx dependency: the checked-in markdown pages
(including the generated ``api.md`` — run ``genapi.py`` first to refresh it)
render through python-markdown with a small shared template and nav bar.

    python docs/build.py          # writes docs/_site/
"""
import shutil
from pathlib import Path

import markdown

DOCS = Path(__file__).parent
SITE = DOCS / '_site'

#: nav order; (stem, title)
PAGES = [('index', 'Overview'), ('concepts', 'Concepts'),
         ('tutorials', 'Tutorials'), ('api', 'API'), ('faq', 'FAQ')]

TEMPLATE = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — megastep_tpu</title>
<style>
 body {{ font: 16px/1.55 system-ui, sans-serif; color: #1a1a1a; margin: 0; }}
 nav {{ background: #10243e; padding: .6rem 1.2rem; }}
 nav a {{ color: #cfe3ff; margin-right: 1.1rem; text-decoration: none; }}
 nav a.current {{ color: #fff; font-weight: 600; }}
 main {{ max-width: 54rem; margin: 0 auto; padding: 1rem 1.2rem 4rem; }}
 pre {{ background: #f4f6f8; padding: .8rem; overflow-x: auto; border-radius: 6px; }}
 code {{ background: #f4f6f8; padding: .08rem .25rem; border-radius: 3px; }}
 pre code {{ padding: 0; }}
 table {{ border-collapse: collapse; }}
 th, td {{ border: 1px solid #d5dbe1; padding: .3rem .6rem; text-align: left; }}
 h1, h2, h3 {{ line-height: 1.25; }}
 a {{ color: #0b5cad; }}
</style>
</head>
<body>
<nav>{nav}</nav>
<main>{body}</main>
</body>
</html>
"""


def nav_html(current):
    links = []
    for stem, title in PAGES:
        cls = ' class="current"' if stem == current else ''
        links.append(f'<a href="{stem}.html"{cls}>{title}</a>')
    return ''.join(links)


def render(stem, title):
    md = markdown.Markdown(extensions=['tables', 'fenced_code', 'toc'])
    body = md.convert((DOCS / f'{stem}.md').read_text())
    # .md cross-links work on GitHub; the site serves .html.
    body = body.replace('.md">', '.html">')
    return TEMPLATE.format(title=title, nav=nav_html(stem), body=body)


def build():
    shutil.rmtree(SITE, ignore_errors=True)
    SITE.mkdir(parents=True)
    (SITE / '.nojekyll').touch()
    for stem, title in PAGES:
        (SITE / f'{stem}.html').write_text(render(stem, title))
    print(f'wrote {len(PAGES)} pages to {SITE}')


if __name__ == '__main__':
    build()
