"""CSS selector -> XPath compiler.

A from-scratch Python implementation of the selector dialect the reference
supports (reference: /root/reference/Sources/Queryable.swift:314-362, pinned
exactly by the 17 string-equality goldens in Tests/CSSTests.swift:26-88).

Supported surface (and the exact translation, per the goldens):

  comma            "ul, ol"       -> ".//ul | .//ol"
  leading context                 -> every expression starts "./" (+"/" join)
  descendant (ws)  "body p"       -> ".//body/descendant::p"
  child            "ul > li"      -> ".//ul/li"
  adjacent sibling "h1 + p"       -> ".//h1/following-sibling::*[1]/self::p"
  general sibling  "p ~ p"        -> ".//p/following-sibling::p"
  wildcard         "*"            -> ".//*" ;  "html *" -> ".//html//*"
  id               "#logo"        -> ".//*[@id = 'logo']"
  class            ".note"        -> ".//*[contains(concat(' ',normalize-space(@class),' '),' note ')]"
  attribute        "img[alt]"     -> ".//img[@alt]" ; "a[rel='next']" -> ".//a[@rel='next']"

The compiler is a pure function; pipeline stages compile each recipe selector
once in the actor's __init__ and cache the resulting XPath AST.
"""

import re

# Token-level patterns, equivalent to the reference's RegexConstants
# (Queryable.swift:306-312): id `\#([\w-_]+)`, class `\.([^\.]+)`,
# attribute `\[([^\[\]]+)\]`.
_ID_RE = re.compile(r"\#([\w\-_]+)")
_CLASS_RE = re.compile(r"\.([^\.]+)")
_ATTR_RE = re.compile(r"\[([^\[\]]+)\]")

# Characters that begin an id/class/attribute suffix inside a simple selector.
_SYMBOL_RE = re.compile(r"[#.\[\]]")

# The reference splits on CharacterSet.whitespaces (space, tab, Unicode Zs —
# not newlines).  Selectors are single-line in practice.
_WS_SPLIT_RE = re.compile(r"[ \t ]")
_WS_STRIP = " \t "


def _compile_simple(token: str) -> str:
    """Expand id/class/attribute suffixes of one simple selector."""
    m = _SYMBOL_RE.search(token)
    if m is None:
        return token
    # A selector that *starts* with #/./[ has no element name: use `*`.
    symbol = "*" if m.start() == 0 else ""
    out = token[: m.start()]

    id_match = _ID_RE.search(token)
    if id_match:
        out += f"{symbol}[@id = '{id_match.group(1)}']"

    for class_match in _CLASS_RE.finditer(token):
        out += (
            f"{symbol}[contains(concat(' ',normalize-space(@class),' '),"
            f"' {class_match.group(1)} ')]"
        )

    for attr_match in _ATTR_RE.finditer(token):
        out += f"[@{attr_match.group(1)}]"

    return out


def xpath_from_css(css: str) -> str:
    """Translate a CSS selector list into an equivalent relative XPath."""
    expressions = []
    for expression in css.split(","):
        if not expression:
            continue
        components = ["./"]
        prefix = None
        for idx, token in enumerate(_WS_SPLIT_RE.split(expression.strip(_WS_STRIP))):
            if token == "*" and idx != 0:
                components.append("/*")
            elif token == ">":
                prefix = ""
            elif token == "+":
                prefix = "following-sibling::*[1]/self::"
            elif token == "~":
                prefix = "following-sibling::"
            else:
                if prefix is None and idx != 0:
                    prefix = "descendant::"
                token = _compile_simple(token)
                if prefix is not None:
                    token = prefix + token
                    prefix = None
                components.append(token)
        expressions.append("/".join(components))
    return " | ".join(expressions)
