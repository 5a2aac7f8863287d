"""Minimal driver-side Turtle parser (no rdflib in this environment).

Covers the subset used by the reference's committed fixtures and shape graphs
(/root/reference/source/Datasets/test.ttl, source/ShapesGraphs/*.ttl):
@prefix / @base, IRIs, prefixed names, `a`, predicate lists `;`, object lists `,`,
anonymous bnodes `[ ... ]`, RDF collections `( ... )`, string literals with
`^^datatype` / `@lang`, triple-quoted long strings (multi-line sh:select
text), bare integers/decimals/booleans, and `#` comments.

Output is a list of triple tuples in the engine's row layout (see
model/triples.py).  Shapes graphs are small (<=8.4k lines in the reference), so a
driver-side parse is the right cost model — the 100 TB side is pages, not shapes.
"""

from __future__ import annotations

import re
from typing import Iterator

from re_shacl_spark.model.triples import iri_triple, lit_triple, vocab

_TOKEN_RE = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<iri><[^>]*>)
    | (?P<tstring>"{3}(?:[^"\\]|\\.|"(?!""))*"{3})
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<langtag>@[a-zA-Z][a-zA-Z0-9-]*)
    | (?P<dcaret>\^\^)
    | (?P<punct>[;,.\[\]()])
    | (?P<number>[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<pname>[A-Za-z_][\w.-]*)?:(?P<local>[\w.-]*)
    | (?P<kw>@prefix|@base|a|true|false)
    """,
    re.VERBOSE,
)

_ESCAPES = {"\\n": "\n", "\\t": "\t", "\\r": "\r", '\\"': '"', "\\\\": "\\"}


def _unescape(s: str) -> str:
    return re.sub(r"\\[ntr\"\\]", lambda m: _ESCAPES[m.group(0)], s)


def _tokenize(text: str) -> Iterator[tuple[str, str]]:
    pos = 0
    n = len(text)
    while pos < n:
        ch = text[pos]
        if ch in " \t\r\n":
            pos += 1
            continue
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ValueError(f"ttl: cannot tokenize at {text[pos:pos+40]!r}")
        pos = m.end()
        if m.lastgroup == "comment":
            continue
        kind = m.lastgroup
        if kind == "local" or (m.group("local") is not None and kind not in ("iri", "string")):
            yield ("pname", (m.group("pname") or "") + ":" + m.group("local"))
        else:
            yield (kind, m.group(0))


class _Parser:
    def __init__(self, text: str):
        self.toks = list(_tokenize(text))
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.triples: list[tuple] = []
        self._bnode_n = 0

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, val: str):
        t = self._next()
        if t[1] != val:
            raise ValueError(f"ttl: expected {val!r}, got {t!r}")

    def _new_bnode(self) -> str:
        self._bnode_n += 1
        return f"_:b{self._bnode_n}"

    def parse(self) -> list[tuple]:
        while self._peek()[0] != "eof":
            kind, val = self._peek()
            if val in ("@prefix", "@base"):
                self._next()
                if val == "@prefix":
                    _, pname = self._next()
                    prefix = pname[: pname.index(":")] if ":" in pname else pname
                    _, iri = self._next()
                    self.prefixes[prefix] = iri[1:-1]
                else:
                    _, iri = self._next()
                    self.base = iri[1:-1]
                self._expect(".")
            else:
                self._statement()
        return self.triples

    def _statement(self):
        subj = self._term(as_subject=True)
        self._predicate_object_list(subj)
        self._expect(".")

    def _predicate_object_list(self, subj: str):
        while True:
            kind, val = self._peek()
            if val in (".", "]", ")") or kind == "eof":
                return
            pred = self._predicate()
            self._object_list(subj, pred)
            if self._peek()[1] == ";":
                self._next()
                continue
            return

    def _predicate(self) -> str:
        kind, val = self._next()
        if val == "a":
            return vocab.TYPE
        if kind == "iri":
            return self.base + val[1:-1] if not val[1:-1].startswith(("http", "urn")) and self.base else val[1:-1]
        if kind == "pname":
            return self._resolve(val)
        raise ValueError(f"ttl: bad predicate {val!r}")

    def _object_list(self, subj: str, pred: str):
        while True:
            self._object(subj, pred)
            if self._peek()[1] == ",":
                self._next()
                continue
            return

    def _object(self, subj: str, pred: str):
        obj = self._term_or_literal()
        if isinstance(obj, tuple):  # literal: (lex, dtype, lang)
            lex, dtype, lang = obj
            self.triples.append(lit_triple(subj, pred, lex, dtype, lang))
        else:
            self.triples.append(iri_triple(subj, pred, obj))

    def _term(self, as_subject: bool = False) -> str:
        kind, val = self._peek()
        if kind == "iri":
            self._next()
            inner = val[1:-1]
            return self.base + inner if self.base and "://" not in inner else inner
        if kind == "pname":
            self._next()
            return self._resolve(val)
        if val == "[":
            self._next()
            b = self._new_bnode()
            self._predicate_object_list(b)
            self._expect("]")
            return b
        if val == "(":
            self._next()
            return self._collection()
        raise ValueError(f"ttl: bad term {val!r}")

    def _collection(self) -> str:
        items = []
        while self._peek()[1] != ")":
            items.append(self._term_or_literal())
        self._next()  # ')'
        if not items:
            return vocab.NIL
        head = self._new_bnode()
        cur = head
        for j, it in enumerate(items):
            if isinstance(it, tuple):
                self.triples.append(lit_triple(cur, vocab.FIRST, it[0], it[1], it[2]))
            else:
                self.triples.append(iri_triple(cur, vocab.FIRST, it))
            if j == len(items) - 1:
                self.triples.append(iri_triple(cur, vocab.REST, vocab.NIL))
            else:
                nxt = self._new_bnode()
                self.triples.append(iri_triple(cur, vocab.REST, nxt))
                cur = nxt
        return head

    def _term_or_literal(self):
        kind, val = self._peek()
        if kind in ("string", "tstring"):
            # tstring: triple-quoted long literal (multi-line sh:select text)
            self._next()
            lex = _unescape(val[3:-3] if kind == "tstring" else val[1:-1])
            dtype, lang = None, None
            k2, v2 = self._peek()
            if k2 == "dcaret":
                self._next()
                dtype = self._term()
            elif k2 == "langtag":
                self._next()
                lang = v2[1:]
            return (lex, dtype, lang)
        if kind == "number":
            self._next()
            dt = vocab.XSD + ("decimal" if "." in val else "integer")
            if "e" in val.lower():
                dt = vocab.XSD + "double"
            return (val, dt, None)
        if val in ("true", "false"):
            self._next()
            return (val, vocab.XSD + "boolean", None)
        return self._term()

    def _resolve(self, pname: str) -> str:
        prefix, local = pname.split(":", 1)
        if prefix not in self.prefixes:
            raise ValueError(f"ttl: undefined prefix {prefix!r}:")
        return self.prefixes[prefix] + local


def parse_ttl(text: str) -> list[tuple]:
    """Parse turtle text -> triple rows (engine layout, src_url=None)."""
    return _Parser(text).parse()


def parse_ttl_file(path: str) -> list[tuple]:
    with open(path, encoding="utf-8") as f:
        return parse_ttl(f.read())
