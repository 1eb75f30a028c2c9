"""URL canonicalization — the normalize-before-dedup pass every
Common-Crawl-style pipeline runs so recrawls of the same page key
identically (pairs with ``ops.snapshots.latest_per_url``).

Reference scope note: the reference (datasketches-rust) has no URL
handling — this is engine-added corpus hygiene, same category as
``ops/text_stats.py`` (SURVEY.md §2.10 "maps/filters/parsers").

All transforms are single Arrow RE2/compute kernels over the column —
no per-row Python — and each step is expressible 1:1 in DuckDB SQL
(both engines run RE2-class regexes), which is what the oracle in
``__ray_entry__`` mirrors.

Canonicalization steps (conservative, lossless for matching):
1. scheme and host lowercased (path/query case is significant, kept);
2. default ports dropped (``http:80``, ``https:443``);
3. fragment stripped;
4. tracking params dropped (``utm_*``, ``gclid``, ``fbclid``) with
   delimiter repair (``?&`` → ``?``, ``&&`` → ``&``, trailing ``?``/``&``);
5. ``domain`` column: host minus a leading ``www.``; naive registered
   domain (last two labels — no PSL dependency, deterministic).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
    r"(?P<host>[^/?#:]+)(?::(?P<port>[0-9]+))?(?P<rest>.*)$"
)
_TRACKING_RE = r"([?&])(?:utm_[^=&#]*|gclid|fbclid)=[^&#]*"


def normalize_url_column(url: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, pa.Array]:
    """url column → (url_norm, registered_domain), fully vectorized."""
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    ex = pc.extract_regex(url, _URL_RE)
    scheme = pc.utf8_lower(pc.struct_field(ex, "scheme"))
    host = pc.utf8_lower(pc.struct_field(ex, "host"))
    port = pc.struct_field(ex, "port")
    rest = pc.struct_field(ex, "rest")

    # fragment off, tracking params out, delimiters repaired
    rest = pc.replace_substring_regex(rest, r"#.*$", "")
    rest = pc.replace_substring_regex(rest, _TRACKING_RE, r"\1")
    rest = pc.replace_substring_regex(rest, r"\?&", "?")
    rest = pc.replace_substring_regex(rest, r"&&+", "&")
    rest = pc.replace_substring_regex(rest, r"[?&]$", "")

    # RE2 leaves an unmatched optional group as "" (not null); a null
    # port only means the whole regex failed (handled by the host
    # null pass-through below)
    port = pc.fill_null(port, "")
    default_port = pc.or_(
        pc.and_(pc.equal(scheme, "http"), pc.equal(port, "80")),
        pc.and_(pc.equal(scheme, "https"), pc.equal(port, "443")),
    )
    keep_port = pc.and_(
        pc.greater(pc.utf8_length(port), 0),
        pc.fill_null(pc.invert(default_port), True),
    )
    port_part = pc.if_else(
        keep_port, pc.binary_join_element_wise(":", port, ""), ""
    )
    norm = pc.binary_join_element_wise(scheme, "://", host, port_part, rest, "")
    # unparseable rows (no scheme://host) pass through untouched
    norm = pc.if_else(pc.is_valid(pc.struct_field(ex, "host")), norm, url)

    bare = pc.replace_substring_regex(host, r"^www\.", "")
    domain = pc.struct_field(
        pc.extract_regex(bare, r"(?P<reg>[^.]+\.[^.]+)$"), "reg"
    )
    domain = pc.if_else(pc.is_valid(domain), domain, bare)
    return norm, domain


def normalize_urls(ds, column: str = "url"):
    """Dataset → same rows + (url_norm, domain) columns. Map-only:
    one vectorized kernel per batch, zero shuffle."""

    def f(batch: pa.Table) -> pa.Table:
        norm, domain = normalize_url_column(batch[column])
        return batch.append_column("url_norm", norm).append_column("domain", domain)

    return ds.map_batches(f, batch_format="pyarrow")


def domain_stats(ds, column: str = "url"):
    """Per registered domain: doc count + total normalized-url length.
    One small groupby after the map-side normalize — the per-domain
    rollup used for domain-level quality gating / crawl budgeting."""
    from ray.data.aggregate import Count, Sum

    def project(batch: pa.Table) -> pa.Table:
        norm, domain = normalize_url_column(batch[column])
        return pa.table(
            {"domain": domain, "url_len": pc.utf8_length(norm).cast(pa.int64())}
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("domain")
        .aggregate(Count(alias_name="n_docs"), Sum("url_len", alias_name="total_url_len"))
    )
