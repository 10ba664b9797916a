"""URL parsing, canonicalization, and registrable-domain extraction.

The crawl-curation key stage functions/html.py feeds: corpus dedup by
URL, per-domain quality rollups, and domain blocklists all key on the
CANONICAL url / registrable domain, not the raw string (the same page
arrives as ``HTTPS://WWW.Example.COM:443/a?utm_source=x&id=1#top`` and
``https://example.com/a?id=1``).

Like functions/html.py, everything is column expressions over the
Java-regex ∩ RE2 subset so the q154 DuckDB twin runs the SAME
patterns and the canonical strings hash byte-identical cross-engine —
and the whole stage rides whole-stage codegen (Spark's builtin
``parse_url`` exists but has no DuckDB twin, so parity pins these
regexes instead).

Canonicalization rules (the conservative, dedup-safe subset):
lowercase scheme and host, strip one leading ``www.``, drop the
default port (80/http, 443/https), drop the fragment, drop tracking
parameters (``utm_*``, ``gclid``, ``fbclid``), sort the surviving
query parameters (param order is not semantic), empty path → ``/``.
Userinfo is preserved (rare, semantic); path percent-encoding is NOT
normalized (%-case normalization needs a decode table — out of the
regex tier, documented limitation).

``registrable_domain`` is the 2-label heuristic plus the common
second-level suffixes (co.uk-class). A production crawl swaps in the
full Public Suffix List as a broadcast join table — the heuristic
keeps this a pure expression; the PSL variant is the same shape with
one broadcast lookup.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query-parameter name prefixes that never change page identity
TRACKING_PREFIXES = ("utm_", "gclid", "fbclid")

#: common second-level labels under 2-letter ccTLDs (co.uk-class)
SECOND_LEVEL = ("co", "com", "net", "org", "ac", "gov", "edu")

_AUTH = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"


def scheme(url: Column) -> Column:
    return F.lower(
        F.regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    )


def host(url: Column) -> Column:
    """Lowercased host: authority minus userinfo and port."""
    auth = F.regexp_extract(url, _AUTH, 1)
    return F.lower(
        F.regexp_replace(
            F.regexp_replace(auth, "^[^@]*@", ""), ":[0-9]+$", ""
        )
    )


def port(url: Column) -> Column:
    """The explicit port string ('' when absent)."""
    return F.regexp_extract(F.regexp_extract(url, _AUTH, 1), ":([0-9]+)$", 1)


def path(url: Column) -> Column:
    return F.regexp_extract(url, _AUTH + "([^?#]*)", 2)


def query(url: Column) -> Column:
    """Query string without '?' ('' when absent); fragment-safe."""
    return F.regexp_extract(
        F.regexp_replace(url, "#.*$", ""), "\\?(.*)$", 1
    )


def _kept_params(url: Column) -> Column:
    """Surviving query params, sorted — tracking params dropped."""
    parts = F.split(query(url), "&")

    def keep(p: Column) -> Column:
        cond = p != ""
        for pre in TRACKING_PREFIXES:
            cond = cond & ~p.startswith(pre)
        return cond

    return F.array_sort(F.filter(parts, keep))


def canonical_url(url: Column) -> Column:
    """The dedup key: see the module docstring for the rule set."""
    sch = scheme(url)
    h = F.regexp_replace(host(url), "^www\\.", "")
    p = port(url)
    default = ((sch == "https") & (p == "443")) | (
        (sch == "http") & (p == "80")
    )
    portpart = F.when(
        (p != "") & ~default, F.concat(F.lit(":"), p)
    ).otherwise(F.lit(""))
    auth = F.regexp_extract(url, _AUTH, 1)
    userinfo = F.regexp_extract(auth, "^([^@]*@)", 1)
    pth = path(url)
    pth = F.when(pth == "", F.lit("/")).otherwise(pth)
    params = F.array_join(_kept_params(url), "&")
    qpart = F.when(
        params != "", F.concat(F.lit("?"), params)
    ).otherwise(F.lit(""))
    return F.concat(sch, F.lit("://"), userinfo, h, portpart, pth, qpart)


def registrable_domain(h: Column) -> Column:
    """example.com / example.co.uk from a host (2-label heuristic +
    the co.uk-class second levels; see module docstring for the PSL
    upgrade path)."""
    labels = F.split(h, "\\.")
    n = F.size(labels)
    # try_element_at: NULL (not an ANSI error) when the host has fewer
    # labels than the index reaches — the n>=3 guard then wins
    second = F.try_element_at(labels, F.lit(-2))
    three = (
        (n >= 3)
        & second.isin(*SECOND_LEVEL)
        & (F.length(F.try_element_at(labels, F.lit(-1))) == 2)
    )
    return F.when(
        three, F.array_join(F.slice(labels, -3, 3), ".")
    ).otherwise(
        F.when(n >= 2, F.array_join(F.slice(labels, -2, 2), ".")).otherwise(h)
    )
