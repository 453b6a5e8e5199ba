"""Frontend structured-generation DSL — eager interpreter.

Reference: python/sglang/lang/ (api.py `function`/`gen`/`select`/`fork`,
interpreter.py StreamExecutor, ir.py SglExpr tree). The reference builds an
async expression graph and ships it to a lazy executor; here programs run
eagerly against a backend, because the TPU runtime already overlaps host
work with device steps and the radix cache makes re-extending a shared
prefix (the thing fork/select exploit) nearly free — page-granular prefix
hits skip the prefill MXU work entirely.

    @function
    def pick(s, q):
        s += "Q: " + q + "\nTool: "
        s += select("tool", ["calculator", "search"])
        s += "\nA: " + gen("ans", max_tokens=32, stop="\n")

    st = pick.run(q="3*7?", backend=EngineBackend(engine))
    st["tool"], st["ans"], st.text()
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Optional, Sequence


class SglExpr:
    """Composable program fragment: ``"text" + gen(...) + "more"``."""

    def __add__(self, other):
        return SglConcat(_parts(self) + _parts(_coerce(other)))

    def __radd__(self, other):
        return SglConcat(_parts(_coerce(other)) + _parts(self))


class SglText(SglExpr):
    def __init__(self, s: str):
        self.s = s


class SglConcat(SglExpr):
    def __init__(self, parts: List[SglExpr]):
        self.parts = parts


class SglGen(SglExpr):
    def __init__(self, name: Optional[str] = None, max_tokens: int = 128,
                 stop=None, temperature: float = 1.0, top_p: float = 1.0,
                 top_k: int = -1, regex: Optional[str] = None,
                 json_schema: Optional[str] = None,
                 frequency_penalty: float = 0.0, presence_penalty: float = 0.0):
        self.name = name
        self.params = {
            "max_new_tokens": max_tokens, "temperature": temperature,
            "top_p": top_p, "top_k": top_k,
            "frequency_penalty": frequency_penalty,
            "presence_penalty": presence_penalty,
        }
        if stop:
            self.params["stop"] = [stop] if isinstance(stop, str) else list(stop)
        if regex:
            self.params["regex"] = regex
        if json_schema:
            self.params["json_schema"] = json_schema


class SglSelect(SglExpr):
    def __init__(self, name: Optional[str], choices: Sequence[str],
                 method: str = "token_length_normalized"):
        if not choices:
            raise ValueError("select needs at least one choice")
        self.name = name
        self.choices = list(choices)
        self.method = method


class SglRoleBegin(SglExpr):
    def __init__(self, role: str):
        self.role = role


class SglRoleEnd(SglExpr):
    def __init__(self, role: str):
        self.role = role


def _coerce(x) -> SglExpr:
    if isinstance(x, SglExpr):
        return x
    if isinstance(x, str):
        return SglText(x)
    raise TypeError(f"cannot append {type(x).__name__} to a program state")


def _parts(x: SglExpr) -> List[SglExpr]:
    return x.parts if isinstance(x, SglConcat) else [x]


# ------------------------------------------------------------------ state
class _RoleCtx:
    def __init__(self, state: "ProgramState", role: str):
        self.state, self.role = state, role

    def __enter__(self):
        self.state += SglRoleBegin(self.role)
        return self.state

    def __exit__(self, *exc):
        self.state += SglRoleEnd(self.role)
        return False


class ProgramState:
    """Accumulated program text + captured variables.

    Roles are delimited with the same ``<|role|>`` scheme as the serving
    fallback chat template (utils/chat_template.py) so DSL programs and the
    OpenAI chat endpoint agree on plain tokenizers."""

    def __init__(self, backend):
        self.backend = backend
        self._text = ""
        self.variables: Dict[str, str] = {}
        self.meta: Dict[str, Any] = {}

    # -- execution
    def __iadd__(self, expr):
        for part in _parts(_coerce(expr)):
            self._run_part(part)
        return self

    def _run_part(self, part: SglExpr) -> None:
        if isinstance(part, SglText):
            self._text += part.s
        elif isinstance(part, SglRoleBegin):
            self._text += f"<|{part.role}|>\n"
        elif isinstance(part, SglRoleEnd):
            self._text += "\n"
        elif isinstance(part, SglGen):
            out = self.backend.generate(self._text, dict(part.params))
            self._text += out
            if part.name:
                self.variables[part.name] = out
        elif isinstance(part, SglSelect):
            scores = self.backend.select(self._text, part.choices, part.method)
            best = part.choices[max(range(len(scores)), key=scores.__getitem__)]
            self._text += best
            if part.name:
                self.variables[part.name] = best
                self.meta[part.name + "__scores"] = scores
        else:  # pragma: no cover
            raise TypeError(f"unknown expr {type(part).__name__}")

    # -- access
    def __getitem__(self, name: str) -> str:
        return self.variables[name]

    def __contains__(self, name: str) -> bool:
        return name in self.variables

    def text(self) -> str:
        return self._text

    # -- roles
    def system(self):
        return _RoleCtx(self, "system")

    def user(self):
        return _RoleCtx(self, "user")

    def assistant(self):
        return _RoleCtx(self, "assistant")

    # -- fork
    def fork(self, n: int = 1) -> List["ProgramState"]:
        """n independent continuations sharing this prefix (reference
        api.py fork / StreamExecutor.fork). The shared prefix stays hot in
        the radix cache, so each branch's prefill is a cache hit."""
        return [copy.deepcopy(self) for _ in range(n)]

    def __deepcopy__(self, memo):
        st = ProgramState(self.backend)  # backend is shared, not copied
        st._text = self._text
        st.variables = dict(self.variables)
        st.meta = dict(self.meta)
        return st


# --------------------------------------------------------------- function
_default_backend = None


def set_default_backend(backend) -> None:
    global _default_backend
    _default_backend = backend


class SglFunction:
    def __init__(self, fn):
        self.fn = fn

    def run(self, *args, backend=None, **kwargs) -> ProgramState:
        be = backend or _default_backend
        if be is None:
            raise ValueError("no backend: pass backend= or set_default_backend")
        state = ProgramState(be)
        self.fn(state, *args, **kwargs)
        return state

    def run_batch(self, batch_kwargs: List[Dict[str, Any]],
                  backend=None) -> List[ProgramState]:
        return [self.run(backend=backend, **kw) for kw in batch_kwargs]

    def __call__(self, *args, **kwargs):
        return self.run(*args, **kwargs)


def function(fn) -> SglFunction:
    return SglFunction(fn)


def gen(name: Optional[str] = None, **kw) -> SglGen:
    return SglGen(name, **kw)


def select(name: Optional[str], choices: Sequence[str],
           method: str = "token_length_normalized") -> SglSelect:
    return SglSelect(name, choices, method)


def system(content: str = "") -> SglExpr:
    return SglRoleBegin("system") + content + SglRoleEnd("system")


def user(content: str = "") -> SglExpr:
    return SglRoleBegin("user") + content + SglRoleEnd("user")


def assistant(content="") -> SglExpr:
    return SglRoleBegin("assistant") + _coerce(content) + SglRoleEnd("assistant")
