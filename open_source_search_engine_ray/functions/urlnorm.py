"""URL parse / normalize — the ``Url.cpp`` / ``UrlParser.cpp`` /
``Punycode.cpp`` analogue (reference ~4k LoC; SURVEY §2.9 scalar misc).

The reference canonicalizes every spidered URL before hashing it into a
docId (lowercased scheme+host, punycoded IDN hosts, default ports
stripped, dot-segments collapsed, fragments dropped).  This module is
that scalar kernel over Python/stdlib: RFC 3986 §6 syntax-based
normalization plus IDNA host encoding (stdlib ``idna`` codec — the
punycode path), exposed both per-URL and as an Arrow batch transform
for pipeline use.

Scope notes, honestly: ``domain_of`` uses the last-two-labels
approximation instead of the reference's TLD table (``Url.cpp``'s
``getDomain`` consulted a compiled suffix list; a public-suffix list is
data this repo does not vendor) — documented, deterministic, and good
enough for per-site grouping over synthetic corpora.
"""

from __future__ import annotations

import re
import urllib.parse

import numpy as np
import pyarrow as pa

DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")

# unreserved characters (RFC 3986 §2.3): %-escapes of these decode
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    "0123456789-._~")


def _norm_pct(s: str) -> str:
    """Decode %-escapes of unreserved chars, uppercase the rest
    (RFC 3986 §6.2.2.1-2)."""
    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()
    return _PCT_RE.sub(repl, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
            continue
        out.append(seg)
    # preserve a trailing slash implied by ./.. final segments
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    norm = "/".join(out)
    if not norm.startswith("/"):
        norm = "/" + norm
    return norm


def _idna_host(host: str) -> str:
    """Lowercase + punycode (IDNA) each label; pass through labels that
    are already ASCII or that IDNA rejects (be liberal in what we
    accept — the reference indexed malformed hosts verbatim too)."""
    host = host.strip().rstrip(".").lower()
    labels = []
    for lab in host.split("."):
        try:
            labels.append(lab.encode("idna").decode("ascii")
                          if lab and not lab.isascii() else lab)
        except UnicodeError:
            labels.append(lab)
    return ".".join(labels)


def parse_url(url: str) -> dict:
    """→ dict(scheme, userinfo, host, ipv6, port, path, query) of the
    NORMALIZED url.  A missing scheme defaults to http (``Url.cpp``
    prepends it).  Liberal on malformed input (the reference indexed
    malformed hosts verbatim): a non-numeric port survives as-is, an
    IPv6 literal keeps its brackets and is lowercased only."""
    u = url.strip()
    if not _SCHEME_RE.match(u):
        u = "http://" + u
    p = urllib.parse.urlsplit(u)
    scheme = p.scheme.lower()
    netloc = p.netloc
    userinfo = ""
    hostport = netloc
    if "@" in netloc:
        userinfo, hostport = netloc.rsplit("@", 1)
    if hostport.startswith("["):                  # IPv6 literal
        raw_host, _, rest = hostport.partition("]")
        host = raw_host[1:].lower()
        port_raw = rest.lstrip(":")
        ipv6 = True
    else:
        raw_host, _, port_raw = hostport.partition(":")
        host = _idna_host(raw_host)
        ipv6 = False
    port: int | str | None = None
    if port_raw:
        if port_raw.isdigit():
            port = int(port_raw)
            if DEFAULT_PORTS.get(scheme) == port:
                port = None
        else:
            port = port_raw                        # malformed: verbatim
    path = _remove_dot_segments(_norm_pct(p.path or "/"))
    query = _norm_pct(p.query)
    return {"scheme": scheme, "userinfo": userinfo, "host": host,
            "ipv6": ipv6, "port": port, "path": path, "query": query}


def _canonical(d: dict) -> str:
    """Canonical string of a :func:`parse_url` dict — the ONE assembly
    shared by the scalar and the batch kernel."""
    netloc = d["userinfo"] + "@" if d["userinfo"] else ""
    netloc += f"[{d['host']}]" if d["ipv6"] else d["host"]
    if d["port"] is not None:
        netloc += f":{d['port']}"
    out = f"{d['scheme']}://{netloc}{d['path']}"
    if d["query"]:
        out += "?" + d["query"]
    return out


def normalize_url(url: str) -> str:
    """Canonical string form: lowercased scheme+punycoded host, default
    port stripped, dot-segments collapsed, unreserved %-escapes decoded,
    fragment dropped; userinfo and IPv6 brackets preserved (RFC 3986 §6
    keeps both — distinct resources must not collapse)."""
    return _canonical(parse_url(url))


def domain_of(host: str) -> str:
    """Registered-domain approximation: the last two labels (see module
    docstring for the honest deviation from the reference's TLD table).
    IP literals (IPv6 contains ':') pass through whole."""
    if ":" in host:
        return host
    labels = host.split(".")
    return ".".join(labels[-2:]) if len(labels) >= 2 else host


def normalize_url_batch(batch: pa.Table,
                        column: str = "url") -> pa.Table:
    """Arrow batch kernel: adds ``url_norm``, ``host``, ``domain``
    columns (the per-URL scalar applied across the column; URL
    normalization is inherently per-string — stateless, so this rides
    any ``map_batches`` stage)."""
    urls = batch[column].to_pylist()
    norm, hosts, doms = [], [], []
    for u in urls:
        try:
            d = parse_url(u or "")
            hosts.append(d["host"])
            doms.append(domain_of(d["host"]))
            norm.append(_canonical(d))
        except Exception:
            norm.append(None)
            hosts.append(None)
            doms.append(None)
    return batch.append_column(
        "url_norm", pa.array(norm, pa.string())).append_column(
        "host", pa.array(hosts, pa.string())).append_column(
        "domain", pa.array(doms, pa.string()))


def synth_url(doc_id: int) -> str:
    """Deterministic messy URL for a doc_id (the corpus has no URL
    column; like the multimodal payloads, test inputs derive from
    doc_id so every run regenerates identical bytes).  Mixes the cases
    normalization must handle: uppercase scheme/host, default ports,
    dot-segments, unreserved %-escapes, fragments, IDN hosts."""
    rng = np.random.default_rng([95, int(doc_id)])
    host_pool = ["Example.COM", "wiki.example.ORG", "news.example.net",
                 "münchen.example", "api.Example.com", "example.com."]
    host = host_pool[int(rng.integers(len(host_pool)))]
    port = ["", ":80", ":443", ":8080"][int(rng.integers(4))]
    scheme = ["http", "HTTP", "https"][int(rng.integers(3))]
    if scheme.lower() == "https" and port == ":80":
        port = ":443"
    path = ["/a/b/../c", "/./x/y", "/p%61th/%7Euser", "/"][
        int(rng.integers(4))]
    frag = ["", "#section"][int(rng.integers(2))]
    return f"{scheme}://{host}{port}{path}{frag}"
