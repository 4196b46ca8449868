"""glog-style logging/CHECK layer (round-3 VERDICT missing #6: the
reference logs through glog everywhere — LOG(INFO) training output,
CHECK_* assertions; print-based until round 4)."""

import io
import re

import pytest

from nct_tpu.utils import glog


@pytest.fixture()
def stream():
    buf = io.StringIO()
    glog.set_stream(buf)
    old = glog._min_level
    glog.set_min_log_level(0)
    yield buf
    glog.set_stream(None)
    glog.set_min_log_level(old)


_LINE = re.compile(
    r"^([IWEF])(\d{4}) (\d{2}:\d{2}:\d{2}\.\d{6}) (\d+) "
    r"([\w.]+\.py):(\d+)\] (.*)$"
)


def test_line_format_is_glog(stream):
    glog.info("hello world")
    line = stream.getvalue().strip()
    m = _LINE.match(line)
    assert m, line
    assert m.group(1) == "I"
    assert m.group(5) == "test_glog.py"
    assert m.group(7) == "hello world"


def test_severity_letters_and_filtering(stream):
    glog.info("a")
    glog.warning("b")
    glog.error("c")
    letters = [ln[0] for ln in stream.getvalue().splitlines()]
    assert letters == ["I", "W", "E"]
    glog.set_min_log_level(glog.ERROR)
    glog.info("dropped")
    glog.error("kept")
    lines = stream.getvalue().splitlines()
    assert "dropped" not in lines[-1] and "kept" in lines[-1]


def test_fatal_logs_then_raises(stream):
    with pytest.raises(glog.CheckError):
        glog.fatal("boom")
    assert stream.getvalue().startswith("F")


def test_check_operators(stream):
    glog.CHECK(True)
    glog.CHECK_EQ(3, 3)
    glog.CHECK_LT(1, 2)
    assert glog.CHECK_NOTNONE(5) == 5
    with pytest.raises(glog.CheckError) as e:
        glog.CHECK_EQ(3, 4, "shape mismatch")
    assert "Check failed: a == b (3 vs. 4) shape mismatch" in str(e.value)
    with pytest.raises(glog.CheckError):
        glog.CHECK_GE(1, 2)
    with pytest.raises(glog.CheckError):
        glog.CHECK_NOTNONE(None)


def test_parse_log_reads_glog_prefixed_lines(stream, tmp_path):
    """The training lines keep their parse_log contract with the glog
    prefix attached (the regexes .search past it, exactly as the
    reference's parser handles Caffe's glog output)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import parse_log

    glog.info("Iteration 2, loss = 0.5")
    glog.info("Iteration 2, lr = 0.1")
    log = tmp_path / "t.log"
    log.write_text(stream.getvalue())
    train_rows, _ = parse_log.parse_log(str(log))
    assert train_rows[0]["NumIters"] == 2
    assert train_rows[0]["loss"] == pytest.approx(0.5)


def test_log_fatal_attributes_external_callsite(stream):
    """glog.log(FATAL, ...) must emit THIS file:line, not glog.py's own
    fatal() frame (ADVICE r04: the depth-2 resolution pointed the line at
    glog.py for the log()->fatal() path)."""
    with pytest.raises(glog.CheckError):
        glog.log(glog.FATAL, "boom")
    line = stream.getvalue().strip()
    assert "test_glog.py" in line
    assert " glog.py" not in line
