"""Structured-generation frontend DSL (reference: python/sglang/lang/).

    from semi_pd_tpu import lang as sgl

    @sgl.function
    def f(s, q):
        s += sgl.system("Answer tersely.")
        s += sgl.user(q)
        with s.assistant():
            s += "Tool: " + sgl.select("tool", ["calculator", "search"])
            s += "\\nAnswer: " + sgl.gen("ans", max_tokens=32)

    sgl.set_default_backend(sgl.EngineBackend(engine))
    st = f.run(q="what is 3*7?")
"""

from semi_pd_tpu.lang.backends import (EngineBackend, OpenAIBackend,
                                        RuntimeEndpoint)
from semi_pd_tpu.lang.interpreter import (
    ProgramState,
    SglFunction,
    assistant,
    function,
    gen,
    select,
    set_default_backend,
    system,
    user,
)

__all__ = [
    "EngineBackend",
    "OpenAIBackend",
    "ProgramState",
    "RuntimeEndpoint",
    "SglFunction",
    "assistant",
    "function",
    "gen",
    "select",
    "set_default_backend",
    "system",
    "user",
]
