"""Unit conversion — the reference's IotUnit rule-string engine
(Iot.Database/IotValueUnits/IotUnit.cs:27-63; ~200 predefined units in
IotValueUnits/Units.cs).

The reference compiles rule strings like "value * 1000" or
"(value - 32) * 5 / 9" with Dynamic LINQ and applies them to every
numeric priority slot except slot 16. Here the rule grammar is parsed by
a small recursive-descent parser (NO eval) into a Column expression —
codegen'd JVM arithmetic, applied per-slot with a transform().

Grammar:  expr   := term (('+'|'-') term)*
          term   := factor (('*'|'/') factor)*
          factor := NUMBER | 'value' | '(' expr ')' | '-' factor
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN = re.compile(r"\s*(\d+\.?\d*|value|[()+\-*/])", re.IGNORECASE)


class RuleError(ValueError):
    pass


def _tokenize(rule: str) -> list[str]:
    out, pos = [], 0
    while pos < len(rule):
        m = _TOKEN.match(rule, pos)
        if not m:
            raise RuleError(f"bad conversion rule near {rule[pos:pos+10]!r}")
        out.append(m.group(1).lower())
        pos = m.end()
    return out


def compile_rule(rule: str):
    """Compile a rule string to a Column -> Column function."""
    tokens = _tokenize(rule)

    def parse(value: Column) -> Column:
        pos = 0

        def peek():
            return tokens[pos] if pos < len(tokens) else None

        def eat(t=None):
            nonlocal pos
            tok = peek()
            if tok is None or (t is not None and tok != t):
                raise RuleError(f"unexpected token {tok!r} in {rule!r}")
            pos += 1
            return tok

        def factor() -> Column:
            tok = peek()
            if tok == "(":
                eat("(")
                e = expr()
                eat(")")
                return e
            if tok == "-":
                eat("-")
                return -factor()
            if tok == "value":
                eat()
                return value
            if tok and re.fullmatch(r"\d+\.?\d*", tok):
                eat()
                return F.lit(float(tok))
            raise RuleError(f"unexpected token {tok!r} in {rule!r}")

        def term() -> Column:
            e = factor()
            while peek() in ("*", "/"):
                op = eat()
                rhs = factor()
                e = e * rhs if op == "*" else e / rhs
            return e

        def expr() -> Column:
            e = term()
            while peek() in ("+", "-"):
                op = eat()
                rhs = term()
                e = e + rhs if op == "+" else e - rhs
            return e

        out = expr()
        if pos != len(tokens):
            raise RuleError(f"trailing tokens in {rule!r}")
        return out

    return parse


@dataclass(frozen=True)
class IotUnit:
    """IotUnit {Group, Name, Symbol} + conversion rules keyed by target
    symbol (IotUnit.cs; rules are 'value'-expressions)."""

    group: str
    name: str
    symbol: str
    conversions: tuple[tuple[str, str], ...] = ()  # (target_symbol, rule)

    def rule_to(self, target_symbol: str) -> str:
        for sym, rule in self.conversions:
            if sym == target_symbol:
                return rule
        raise RuleError(f"no conversion {self.symbol} -> {target_symbol}")


# A representative slice of Units.cs (the full table is data, not code —
# extendable by adding rows)
UNITS: dict[str, IotUnit] = {
    u.symbol: u
    for u in [
        IotUnit("temperature", "celsius", "degC",
                (("degF", "value * 9 / 5 + 32"), ("K", "value + 273.15"))),
        IotUnit("temperature", "fahrenheit", "degF",
                (("degC", "(value - 32) * 5 / 9"),)),
        IotUnit("temperature", "kelvin", "K", (("degC", "value - 273.15"),)),
        IotUnit("length", "meter", "m", (("km", "value / 1000"), ("mm", "value * 1000"))),
        IotUnit("length", "kilometer", "km", (("m", "value * 1000"),)),
        IotUnit("power", "watt", "W", (("kW", "value / 1000"),)),
        IotUnit("power", "kilowatt", "kW", (("W", "value * 1000"),)),
    ]
}


def convert(value: Column, from_symbol: str, to_symbol: str) -> Column:
    """Convert a numeric column between units via the rules table."""
    if from_symbol == to_symbol:
        return value
    rule = UNITS[from_symbol].rule_to(to_symbol)
    return compile_rule(rule)(value)


def convert_slots(values: Column, from_symbol: str, to_symbol: str) -> Column:
    """Apply a unit conversion to every numeric priority slot EXCEPT slot
    16 (IotUnit.cs:27-63 skips slot 16 — the default slot keeps its
    configured value). Slots hold strings; non-numeric slots pass through
    unchanged."""
    if from_symbol == to_symbol:
        return values
    fn = compile_rule(UNITS[from_symbol].rule_to(to_symbol))
    return F.transform(
        values,
        lambda v, i: F.when(
            (i != 15) & v.try_cast("double").isNotNull(),  # i is 0-based; slot 16 -> idx 15
            fn(v.cast("double")).cast("string"),
        ).otherwise(v),
    )
