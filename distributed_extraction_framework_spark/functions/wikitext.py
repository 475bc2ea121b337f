"""Wiki-markup parsing: regex patterns (shared JVM/Python) + the single
vectorized parse pass for template-structured constructs.

Design split (SURVEY.md §2.2, §7):

* **Flat, regular constructs** (links, categories, redirects, template
  names) are extracted JVM-side with ``F.regexp_extract_all`` — they stay
  inside whole-stage codegen, no Python in the hot path.
* **Recursive constructs** (infobox key/values with nested links and
  templates, coordinate templates with variable arity) need a real
  brace-depth parser → ONE Arrow-vectorized pandas UDF
  (``parse_page_udf``) that parses each page exactly once and returns a
  struct; every downstream dataset (infobox_properties, geo_coordinates,
  mappingbased_*) is derived from that struct with Catalyst explodes.
  This mirrors the reference's composite-extractor single pass
  (DistExtractionJob.scala:39-58) while keeping Python per-batch, not
  per-row.

The regex *patterns* are written in the common subset of Java regex and
Python ``re`` so the Spark plan and the pure-Python oracle
(oracle/pyref.py) provably scan the same grammar.
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd

# --------------------------------------------------------------------------
# patterns (portable: Java regex ∩ Python re; no possessive quantifiers)
# --------------------------------------------------------------------------

# reference semantics: DistRedirects.scala:155-170 — language-specific
# #REDIRECT keyword, optional colon, first wiki link target.
REDIRECT_PATTERN = r"(?i)^[ \t]*#(?:REDIRECT|WEITERLEITUNG|REDIRECTION)[ \t]*:?[ \t]*\[\[([^\[\]|#]+)[^\]]*\]\]"

# every [[...]] occurrence; inner routing (category/file/interlanguage/main)
# happens in Catalyst on the captured target string.
INTERNAL_LINK_PATTERN = r"\[\[([^\[\]]+)\]\]"

# bracketed external link: [http://x label] / [https://x]
BRACKET_EXTERNAL_PATTERN = r"\[(https?://[^\s\]]+)[^\]]*\]"
# bare external URL (not preceded by '[' or '=' — avoids double-count with
# bracketed links and infobox `website = http://...` values staying raw)
BARE_EXTERNAL_PATTERN = r"(?<![\[=/])\b(https?://[^\s\]\[<>\"{}|]+)"

# each template start `{{Name` (captures nested templates too, which is the
# published ArticleTemplates semantics: every transcluded template)
TEMPLATE_NAME_PATTERN = r"\{\{[ \t]*([^{}|\n]+?)[ \t]*(?=[|}\n])"

# interlanguage link target inside [[...]]: 'de:Titel' (2-3 letter code)
INTERLANGUAGE_PREFIX = r"^[a-z]{2,3}:"

# first bold span: '''Title'''
BOLD_LEAD_PATTERN = r"'''([^']+)'''"

_REDIRECT_RE = re.compile(REDIRECT_PATTERN)
_TEMPLATE_OPEN_RE = re.compile(r"\{\{")


# --------------------------------------------------------------------------
# pure-Python kernels (used by the pandas UDF; importable without Spark)
# --------------------------------------------------------------------------

def find_top_level_templates(text: str) -> list[str]:
    """Return the raw source of every template occurrence, including nested
    ones, via brace-depth matching (a regex cannot balance braces)."""
    out: list[str] = []
    n = len(text)
    i = 0
    opens: list[int] = []
    while i < n - 1:
        if text[i] == "{" and text[i + 1] == "{":
            opens.append(i)
            i += 2
        elif text[i] == "}" and text[i + 1] == "}" and opens:
            start = opens.pop()
            out.append(text[start : i + 2])
            i += 2
        else:
            i += 1
    return out


def split_template(src: str) -> tuple[str, list[str]]:
    """Split ``{{Name|a|k=v|...}}`` into (name, top-level parts).

    Splits on '|' only at brace/bracket depth 0 so values containing
    ``[[A|b]]`` or nested ``{{...}}`` survive intact.
    """
    body = src[2:-2]
    parts: list[str] = []
    depth_brace = 0
    depth_brack = 0
    cur: list[str] = []
    i = 0
    n = len(body)
    while i < n:
        c = body[i]
        nxt = body[i + 1] if i + 1 < n else ""
        if c == "{" and nxt == "{":
            depth_brace += 1
            cur.append("{{")
            i += 2
            continue
        if c == "}" and nxt == "}":
            depth_brace -= 1
            cur.append("}}")
            i += 2
            continue
        if c == "[" and nxt == "[":
            depth_brack += 1
            cur.append("[[")
            i += 2
            continue
        if c == "]" and nxt == "]":
            depth_brack -= 1
            cur.append("]]")
            i += 2
            continue
        if c == "|" and depth_brace == 0 and depth_brack == 0:
            parts.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    parts.append("".join(cur))
    name = parts[0].strip()
    return name, parts[1:]


def parse_infoboxes(text: str) -> list[tuple[str, str, str]]:
    """All ``{{Infobox ...}}`` key/value triples: (template, key, value)."""
    out: list[tuple[str, str, str]] = []
    for src in find_top_level_templates(text):
        name, parts = split_template(src)
        if not name.lower().startswith("infobox"):
            continue
        for part in parts:
            if "=" not in part:
                continue
            key, _, value = part.partition("=")
            key = key.strip()
            value = value.strip()
            if key and value:
                out.append((name, key, value))
    return out


def _dms_to_decimal(nums: list[float], hemi: str) -> float:
    deg = nums[0] if len(nums) > 0 else 0.0
    minute = nums[1] if len(nums) > 1 else 0.0
    sec = nums[2] if len(nums) > 2 else 0.0
    val = deg + minute / 60.0 + sec / 3600.0
    if hemi in ("S", "W"):
        val = -val
    return val


def parse_coords(text: str) -> list[tuple[float, float]]:
    """Parse ``{{Coord|...}}`` templates (published GeoExtractor semantics).

    Supports decimal (``{{Coord|48.8567|2.3508}}``) and DMS forms
    (``{{Coord|48|51|24|N|2|21|03|E}}``, ``{{Coord|48|51|N|2|21|E}}``).
    """
    out: list[tuple[float, float]] = []
    for src in find_top_level_templates(text):
        name, parts = split_template(src)
        if name.strip().lower() != "coord":
            continue
        # positional args only, drop key=value display params
        pos = [p.strip() for p in parts if "=" not in p and p.strip()]
        try:
            if (
                len(pos) >= 2
                and _is_float(pos[0])
                and _is_float(pos[1])
                and not any(p in ("N", "S", "E", "W") for p in pos[:4])
            ):
                out.append((float(pos[0]), float(pos[1])))
                continue
            # DMS: numbers until N/S, then numbers until E/W
            lat_nums: list[float] = []
            lon_nums: list[float] = []
            lat_h = lon_h = ""
            bucket: list[float] = lat_nums
            for p in pos:
                if p in ("N", "S"):
                    lat_h = p
                    bucket = lon_nums
                elif p in ("E", "W"):
                    lon_h = p
                    break
                elif _is_float(p):
                    bucket.append(float(p))
            if lat_h and lon_h and lat_nums and lon_nums:
                out.append(
                    (_dms_to_decimal(lat_nums, lat_h), _dms_to_decimal(lon_nums, lon_h))
                )
        except (ValueError, IndexError):
            continue
    return out


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def parse_page_kernel(text: str) -> dict:
    """One full structural parse of a page: the payload of the single
    vectorized parse pass. Returns the PARSED_PAGE_SCHEMA dict."""
    if not text:
        return {"infobox": [], "coords": []}
    infobox = [
        {"template": t, "key": k, "value": v} for (t, k, v) in parse_infoboxes(text)
    ]
    coords = [{"lat": la, "lon": lo} for (la, lo) in parse_coords(text)]
    return {"infobox": infobox, "coords": coords}


def html_to_text_kernel(html: bytes | None) -> str | None:
    """Extract the markup payload from synthetic HTML, byte-identically.

    Contract (BASELINE.json input_hint): ``text`` must be byte-identical to
    what this function derives from ``html``. The synthetic HTML wraps the
    markup in ``<pre data-kind="source">…</pre>`` with the three XML
    escapes; this inverts exactly that.
    """
    if html is None:
        return None
    s = html.decode("utf-8")
    start = s.find('<pre data-kind="source">')
    if start == -1:
        return ""
    start += len('<pre data-kind="source">')
    end = s.find("</pre>", start)
    body = s[start : end if end != -1 else len(s)]
    return body.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


# --------------------------------------------------------------------------
# pandas (Arrow-vectorized) wrappers
# --------------------------------------------------------------------------

def parse_page_series(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: parse_page_kernel(t if isinstance(t, str) else ""))


def html_to_text_series(htmls: pd.Series) -> pd.Series:
    return htmls.map(html_to_text_kernel)


def make_parse_page_udf():
    """Pandas UDF: text → PARSED_PAGE_SCHEMA struct (one parse per page)."""
    from pyspark.sql.functions import pandas_udf

    from ..schema import PARSED_PAGE_SCHEMA

    @pandas_udf(PARSED_PAGE_SCHEMA)
    def parse_page(texts: pd.Series) -> pd.DataFrame:
        parsed = [parse_page_kernel(t if isinstance(t, str) else "") for t in texts]
        return pd.DataFrame(
            {
                "infobox": [
                    [(d["template"], d["key"], d["value"]) for d in p["infobox"]]
                    for p in parsed
                ],
                "coords": [
                    [(d["lat"], d["lon"]) for d in p["coords"]] for p in parsed
                ],
            }
        )

    return parse_page


def make_html_to_text_udf():
    """Pandas UDF: html binary → byte-identical markup text."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def html_to_text(htmls: pd.Series) -> pd.Series:
        return htmls.map(html_to_text_kernel)

    return html_to_text
