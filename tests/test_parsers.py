"""Tool-call and reasoning parser flags.

Reference: srt/function_call_parser.py:495 (FunctionCallParser with a
--tool-call-parser format registry) and srt/reasoning_parser.py:121
(--reasoning-parser splitting <think> chain-of-thought into
message.reasoning_content, streaming-aware).
"""

import json

from semi_pd_tpu.utils.function_call import parse_tool_calls
from semi_pd_tpu.utils.reasoning_parser import ReasoningParser

QWEN = 'before <tool_call>{"name": "get_weather", "arguments": {"city": "SF"}}</tool_call> after'
MISTRAL = '[TOOL_CALLS] [{"name": "add", "arguments": {"a": 1, "b": 2}}]'
LLAMA = '<|python_tag|>{"name": "search", "parameters": {"q": "tpu"}}'


def test_tool_parser_auto_detect():
    for text, name in ((QWEN, "get_weather"), (MISTRAL, "add"), (LLAMA, "search")):
        content, calls = parse_tool_calls(text)
        assert len(calls) == 1 and calls[0]["function"]["name"] == name


def test_tool_parser_format_restriction():
    # The right format parses...
    _, calls = parse_tool_calls(MISTRAL, parser="mistral")
    assert len(calls) == 1
    # ...a mismatched format finds nothing (markup left in content).
    content, calls = parse_tool_calls(MISTRAL, parser="qwen25")
    assert calls == [] and "[TOOL_CALLS]" in content
    _, calls = parse_tool_calls(QWEN, parser="llama3")
    assert calls == []
    # Unknown parser name falls back to auto-detect.
    _, calls = parse_tool_calls(QWEN, parser="nonexistent")
    assert len(calls) == 1


def test_reasoning_parser_oneshot():
    r, c = ReasoningParser("deepseek-r1").parse("<think>step 1</think>answer")
    assert r == "step 1" and c == "answer"
    # r1 templates often emit the opening tag themselves
    r, c = ReasoningParser("deepseek-r1").parse("implicit cot</think>final")
    assert r == "implicit cot" and c == "final"
    # forced-reasoning model mid-thought (no closer yet): ALL reasoning —
    # must agree with the streaming path
    r, c = ReasoningParser("deepseek-r1").parse("still thinking")
    assert r == "still thinking" and c == ""
    # explicit-opener model without tags: plain content
    r, c = ReasoningParser("qwen3").parse("just an answer")
    assert r == "" and c == "just an answer"


def test_reasoning_parser_streaming_matches_oneshot():
    text = "<think>a long chain of thought</think>the actual answer"
    for cut in range(1, len(text)):
        p = ReasoningParser("qwen3")
        r = c = ""
        for delta in (text[:cut], text[cut:]):
            rd, cd = p.parse_stream(delta)
            r += rd
            c += cd
        assert "chain of thought" in r, cut
        assert c == "the actual answer", cut
        assert "</think" not in c and "<think>" not in c, cut


def test_server_args_have_parser_flags():
    from semi_pd_tpu.config.server_args import ServerArgs

    a = ServerArgs(model_path="", random_weights=True,
                   tool_call_parser="qwen25", reasoning_parser="deepseek-r1")
    assert a.tool_call_parser == "qwen25"
    assert a.reasoning_parser == "deepseek-r1"


def test_reasoning_parser_flush_drains_partial_tag_holdback():
    # Stream output ending in a possible tag prefix: the holdback withholds
    # it; flush() must emit the residue (ADVICE r2: truncated "<", "<t", ...)
    p = ReasoningParser("qwen3")
    r, c = p.parse_stream("answer ends with <t")
    assert c == "answer ends with "
    rf, cf = p.flush()
    assert rf == "" and cf == "<t"
    # inside reasoning: residue goes to reasoning_content
    p = ReasoningParser("deepseek-r1")
    r, c = p.parse_stream("thinking </th")
    assert r == "thinking "
    rf, cf = p.flush()
    assert rf == "</th" and cf == ""
    # nothing held back -> nothing emitted
    assert p.flush() == ("", "")


def test_unknown_tool_call_parser_rejected_at_server_args():
    import pytest

    from semi_pd_tpu.config.server_args import ServerArgs

    with pytest.raises(ValueError, match="tool-call-parser"):
        ServerArgs(model_path="", random_weights=True,
                   tool_call_parser="llama")  # typo for llama3/llama32


def test_streaming_tool_call_detector():
    from semi_pd_tpu.utils.function_call import StreamingToolCallDetector

    # markup split across deltas: nothing leaks into content
    det = StreamingToolCallDetector("qwen25")
    out = ""
    for d in ['I will call: <tool', '_call>{"name": "f", "argum',
              'ents": {"x": 1}}</tool_call>']:
        out += det.feed(d)
    assert out == "I will call: "
    residual, calls = det.finish()
    assert len(calls) == 1 and calls[0]["function"]["name"] == "f"
    assert json.loads(calls[0]["function"]["arguments"]) == {"x": 1}

    # plain text: partial-prefix holdback drains at finish
    det = StreamingToolCallDetector("qwen25")
    out = det.feed("no calls here <to")
    assert out == "no calls here "
    residual, calls = det.finish()
    assert residual == "<to" and calls == []

    # unparseable markup is released as plain text
    det = StreamingToolCallDetector("qwen25")
    det.feed("<tool_call>not json")
    residual, calls = det.finish()
    assert calls == [] and residual == "<tool_call>not json"

    # mistral format
    det = StreamingToolCallDetector("mistral")
    det.feed('[TOOL_CALLS] [{"name": "g", "arguments": {}}]')
    residual, calls = det.finish()
    assert len(calls) == 1 and calls[0]["function"]["name"] == "g"
