"""Typed error surface, mirroring the reference's XMLError enum.

Reference: /root/reference/Sources/Error.swift:28-48 — `parserFailure` for
unparseable input, `invalidData` for encoding failures, and
`libXMLError(code:message:)` carrying libxml2 codes.  The two codes the
reference test-suite pins down (Tests/XMLTests.swift:69-89):

  1207  XPATH_EXPR_ERROR      "Invalid expression"
  1209  XPATH_UNKNOWN_FUNC_ERROR  "Unregistered function"

Inside Ray Data batch UDFs these exceptions are never allowed to escape: a
failing row becomes a `status='error'` output row (poison-pill tolerance).
"""

XPATH_INVALID_EXPRESSION = 1207
XPATH_UNREGISTERED_FUNCTION = 1209


class FuziError(Exception):
    """Base class for all engine errors."""


class ParseError(FuziError):
    """Document could not be parsed at all (reference: XMLError.parserFailure)."""


class InvalidDataError(FuziError):
    """Input bytes could not be decoded (reference: XMLError.invalidData)."""


class QueryError(FuziError):
    """XPath compile/eval error (reference: XMLError.libXMLError(code:message:))."""

    def __init__(self, code: int, message: str):
        super().__init__(f"xpath error {code}: {message}")
        self.code = code
        self.message = message

    @classmethod
    def invalid_expression(cls) -> "QueryError":
        return cls(XPATH_INVALID_EXPRESSION, "Invalid expression")

    @classmethod
    def unregistered_function(cls) -> "QueryError":
        return cls(XPATH_UNREGISTERED_FUNCTION, "Unregistered function")
