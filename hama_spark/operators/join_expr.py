"""Join expression language (J1) — the composite-join mini-DSL.

Reference: bsp/join/CompositeInputFormat.java:42-101 grammar

    func ::= <ident>([<func>,]*<func>)
    func ::= tbl(<class>, "<path>")

with built-in idents ``inner`` / ``outer`` / ``override``
(CompositeInputFormat.addDefaults:66-73) and user-defined idents via
``bsp.join.define.<x>`` (:79-93); parser at bsp/join/Parser.java (~450
LoC of lexer+RPN). Here the whole thing is a ~40-line recursive-descent
parser producing a DataFrame plan: ``tbl`` resolves a name (or a
parquet/csv path) to a DataFrame, the combinators map onto
composite_join / override_join, and Catalyst picks the physical join.

    parse_join_expr('inner(tbl(a), override(tbl(b), tbl(c)))',
                    tables={'a': dfa, 'b': dfb, 'c': dfc}, on='k')
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hama_spark.operators.joins import composite_join, override_join

_TOKEN = re.compile(r"\s*([A-Za-z_]\w*|\(|\)|,|\"[^\"]*\")")


def _tokenize(expr: str) -> list[str]:
    out, pos = [], 0
    while pos < len(expr):
        m = _TOKEN.match(expr, pos)
        if not m:
            if expr[pos:].strip():
                raise ValueError(f"bad token at {expr[pos:]!r}")
            break
        out.append(m.group(1))
        pos = m.end()
    return out


def parse_join_expr(
    expr: str,
    tables: dict[str, DataFrame] | None = None,
    on: str | list[str] = "key",
    spark: SparkSession | None = None,
    combinators: dict[str, Callable[[list[DataFrame]], DataFrame]] | None = None,
) -> DataFrame:
    """Evaluate a composite-join expression to a DataFrame.

    ``tbl(name)`` / bare ``name`` looks up ``tables``; ``tbl("path")``
    reads parquet via ``spark``. ``combinators`` adds user idents (the
    bsp.join.define.<x> hook); built-ins: inner, outer, override.
    """
    tables = tables or {}
    combs: dict[str, Callable[[list[DataFrame]], DataFrame]] = {
        "inner": lambda dfs: composite_join(dfs, on=on, how="inner"),
        "outer": lambda dfs: composite_join(dfs, on=on, how="full_outer"),
        "override": lambda dfs: override_join(dfs, on=on),
        **(combinators or {}),
    }
    toks = _tokenize(expr)
    pos = 0

    def peek() -> str | None:
        return toks[pos] if pos < len(toks) else None

    def eat(expected: str | None = None) -> str:
        nonlocal pos
        if pos >= len(toks):
            raise ValueError(f"unexpected end of expression {expr!r}")
        tok = toks[pos]
        if expected is not None and tok != expected:
            raise ValueError(f"expected {expected!r}, got {tok!r} in {expr!r}")
        pos += 1
        return tok

    def resolve(name: str) -> DataFrame:
        if name in tables:
            return tables[name]
        raise ValueError(f"unknown table {name!r} (have {sorted(tables)})")

    def parse_node() -> DataFrame:
        tok = eat()
        if tok == "tbl":
            eat("(")
            arg = eat()
            # optional reference-style leading class arg: tbl(Class, "path")
            if peek() == ",":
                eat(",")
                arg = eat()
            eat(")")
            if arg.startswith('"'):
                if spark is None:
                    raise ValueError("tbl(\"path\") needs spark=")
                return spark.read.parquet(arg.strip('"'))
            return resolve(arg)
        if tok in combs:
            eat("(")
            children = [parse_node()]
            while peek() == ",":
                eat(",")
                children.append(parse_node())
            eat(")")
            if len(children) < 2:
                raise ValueError(f"{tok} needs >= 2 children")
            return combs[tok](children)
        # bare identifier = table shorthand
        return resolve(tok)

    result = parse_node()
    if pos != len(toks):
        raise ValueError(f"trailing tokens {toks[pos:]} in {expr!r}")
    return result
