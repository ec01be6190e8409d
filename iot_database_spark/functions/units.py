"""Unit conversion — the reference's IotUnit rule-string engine
(Iot.Database/IotValueUnits/IotUnit.cs:27-63; 435 predefined units /
46 groups / 1232 conversion rules in IotValueUnits/Units.cs, shipped
here as generated data in units_catalog.py).

Parity note: the engine applies `target.ConversionRules[source.Name]`
to the source value verbatim (IotUnit.cs:36-53). Some reference groups
publish rules inverted relative to their own comments (e.g. Length:
Units.cs:1322 `kilometers["meters"] = "value * 1000"` commented
"Convert m to km"); we reproduce the published rule strings exactly, so
conversions match what the reference computes — including those quirks.

The reference compiles rule strings like "value * 1000" or
"(value - 32) * 5 / 9" with Dynamic LINQ and applies them to every
numeric priority slot except array index 16 (= priority 17, the
QueryConfiguration slot). Here the rule grammar is parsed by
a small recursive-descent parser (NO eval) into a Column expression —
codegen'd JVM arithmetic, applied per-slot with a transform().

Grammar:  expr   := term (('+'|'-') term)*
          term   := factor (('*'|'/') factor)*
          factor := NUMBER | 'value' | 'Math.PI' | '(' expr ')' | '-' factor
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_NUM = r"\d+\.?\d*(?:[eE][+-]?\d+)?"
_TOKEN = re.compile(rf"\s*({_NUM}|math\.pi|value|[()+\-*/])", re.IGNORECASE)


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
            if tok == "math.pi":
                # Math.PI in the reference's Dynamic-LINQ rule strings
                eat()
                import math

                return F.lit(math.pi)
            if tok and re.fullmatch(_NUM, tok, re.IGNORECASE):
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
    """IotUnit {Group, Name, Symbol} + conversion rules. Rules live on
    the TARGET unit keyed by the SOURCE unit's name — IotUnit.cs:36
    resolves `target.ConversionRules[source.Unit.Name]`."""

    group: str
    name: str
    symbol: str
    conversions: tuple[tuple[str, str], ...] = ()  # (source_name, rule)

    def rule_from(self, source_name: str) -> str:
        source_name = _NAME_ALIASES.get(source_name, source_name)
        for src, rule in self.conversions:
            if _NAME_ALIASES.get(src, src) == source_name:
                return rule
        raise RuleError(f"no conversion {source_name} -> {self.name}")


# The reference's Power rules key watts as "watts_power" while the unit's
# own Name is "watts" (Units.cs Power group) — its own Convert() would
# throw NotSupportedException for watts->anything. Bridge the key so the
# published rules are reachable; documented divergence.
_NAME_ALIASES: dict[str, str] = {"watts_power": "watts"}

# Symbol shorthands kept for API convenience (the reference API passes
# IotUnit structs, so it never needs string lookup; we accept name or
# unambiguous symbol, plus these legacy spellings for ASCII-only callers)
_LEGACY: dict[str, str] = {
    "degC": "degrees_celsius",
    "degF": "degrees_fahrenheit",
    "K": "degrees_kelvin",
    "m": "meters",
    "km": "kilometers",
    "mm": "millimeters",
    "W": "watts",
    "kW": "kilowatts",
}


def _load_catalog() -> tuple[
    tuple[IotUnit, ...], dict[str, IotUnit], dict[str, str]
]:
    from iot_database_spark.functions.units_catalog import UNIT_ROWS

    all_units = tuple(
        IotUnit(group, name, symbol, tuple(convs))
        for group, name, symbol, convs in UNIT_ROWS
    )
    by_name: dict[str, IotUnit] = {}
    sym_count: dict[str, int] = {}
    for u in all_units:
        cur = by_name.get(u.name)
        # nine reference names exist in TWO groups (watts in Electrical
        # and Power, henrys in Electrical and Inductance, ...): prefer
        # the definition that publishes conversion rules; the group-aware
        # fallback in conversion_rule() reaches the other one
        if cur is None or (not cur.conversions and u.conversions):
            by_name[u.name] = u
        sym_count[u.symbol] = sym_count.get(u.symbol, 0) + 1
    # symbols are only a lookup key when globally unambiguous ("$" covers
    # 30 currencies; "L" six volume/illuminance units)
    by_symbol = {
        u.symbol: u.name
        for u in all_units
        if u.symbol and sym_count[u.symbol] == 1
    }
    return all_units, by_name, by_symbol


ALL_UNITS, UNITS, _SYMBOL_TO_NAME = _load_catalog()


def _in_group(name: str, group: str) -> IotUnit | None:
    for u in ALL_UNITS:
        if u.name == name and u.group == group:
            return u
    return None


def resolve(unit: str) -> IotUnit:
    """Resolve a unit by name, unambiguous symbol, or legacy shorthand."""
    name = _LEGACY.get(unit, unit)
    if name in UNITS:
        return UNITS[name]
    if unit in _SYMBOL_TO_NAME:
        return UNITS[_SYMBOL_TO_NAME[unit]]
    raise RuleError(f"unknown unit {unit!r}")


def _resolve_pair(from_unit: str, to_unit: str) -> tuple[IotUnit, IotUnit]:
    """Resolve both ends into ONE group (dual-group names re-resolve
    into the counterpart's group); raises RuleError on a true cross-
    group pair (reference InvalidCastException, IotUnit.cs:29-30)."""
    src, dst = resolve(from_unit), resolve(to_unit)
    if src.group != dst.group:
        alt = _in_group(src.name, dst.group) or _in_group(dst.name, src.group)
        if alt is not None and alt.name == src.name:
            src = alt
        elif alt is not None:
            dst = alt
        else:
            raise RuleError(f"cannot convert {src.group} to {dst.group}")
    return src, dst


def conversion_rule(from_unit: str, to_unit: str) -> str:
    """The reference rule string converting from_unit -> to_unit.

    Raises RuleError when the units are in different groups (reference
    throws InvalidCastException, IotUnit.cs:29-30) or no rule is
    published (NotSupportedException, IotUnit.cs:62)."""
    src, dst = _resolve_pair(from_unit, to_unit)
    return dst.rule_from(src.name)


# Groups whose published rule tables are inverted relative to physical
# reality (the reference's own comments disagree with its rule strings).
# Both groups publish every pair in both directions, so the physically
# correct factor for a->b is exactly the published rule for b->a.
_INVERTED_GROUPS = frozenset({"Length", "Power"})


def convert(
    value: Column, from_unit: str, to_unit: str, corrected: bool = False
) -> Column:
    """Convert a numeric column between units via the rules table.

    Two parity caveats (documented in README "Unit-catalog data
    quirks"): the Length/Power groups' published rules are inverted
    relative to physical reality and are applied AS PUBLISHED —
    convert(c, 'm', 'km') returns c*1000, matching the reference's
    `target.ConversionRules[source.Name]` lookup, not physics; pass
    `corrected=True` to opt into the physically-correct direction for
    those two groups (the reverse-direction published rule — both
    groups' tables are complete in both directions). And the
    same-resolved-name identity shortcut below cannot see groups, so a
    dual-group name pair (Electrical watts vs Power watts) returns
    identity where `IotUnit.Convert` would have thrown on its group
    check (IotUnit.cs:29) — unreachable through this string-name API,
    divergence documented rather than guessed at."""
    if resolve(from_unit).name == resolve(to_unit).name:
        return value
    src, dst = _resolve_pair(from_unit, to_unit)
    if corrected and src.group in _INVERTED_GROUPS:
        return compile_rule(src.rule_from(dst.name))(value)
    return compile_rule(dst.rule_from(src.name))(value)


def convert_slots(values: Column, from_unit: str, to_unit: str) -> Column:
    """Apply a unit conversion to every numeric priority slot EXCEPT
    array index 16 = priority 17, the QueryConfiguration slot
    (IotUnit.cs:50 `if (i != 16 && double.TryParse(...))` over the
    0-based Values array; SetValue maps priority p -> index p-1).
    Slots hold strings; non-numeric slots pass through unchanged."""
    if resolve(from_unit).name == resolve(to_unit).name:
        return values
    fn = compile_rule(conversion_rule(from_unit, to_unit))
    return F.transform(
        values,
        lambda v, i: F.when(
            (i != 16) & v.try_cast("double").isNotNull(),
            fn(v.cast("double")).cast("string"),
        ).otherwise(v),
    )
