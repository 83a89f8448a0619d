"""Row-level fixture vectors ported from the reference's unit tests.

Sources (path:line into /root/reference/):
- CEF:    internal/processor/kv/cef_test.go:5-156
- KV:     internal/processor/kv/kv_test.go:9-47
- syslog: internal/processor/syslog/syslog_test.go:8-51
- templating: pkg/core/variable_replacer/variable_replacer_test.go
"""

from datetime import datetime, timezone

import pytest

from collector_spark import oracle

CEF1 = "0|illusive|illusive|3.1.128.1719|illusive:heartbeat|Heartbeat|0|dvc=10.118.182.162 rt=1600239263565 cat=illusive:SYS"
CEF2 = "CEF:0|Cool Vendor|Cool Product|1.0|FLAKY_EVENT|Something flaky happened.|3|requestClientApplication=Go-http-client/1.1 sourceAddress=127.0.0.1"
CEF3 = r"0|illusive|illusive|3.1.128.1719|illusive:audit|Audit|5|msg=theuser@domain.local logged out {User role \\= ROLE_ADMIN; Source address \\= 10.120.10.152}  dvc=10.105.33.50 rt=1600239250955 duser=theuser@domain.local cat=illusive:info outcome=SUCCESS"
CEF4 = r"illusive|illusive|3.1.128.1719|illusive:heartbeat|Heartbeat|0|dvc=10.118.182.162 rt=1600239263565 cat=illusive:SYS"
CEF5 = "CEF:0|Cool Vendor|Cool Product|1.0|FLAKY_EVENT|Something flaky happened.|3|requestClientApplication=Go-http-client/1.1 blank2= blank3= blank4= sourceAddress=127.0.0.1 blank="


def test_cef1():
    obj = oracle.parse_cef(CEF1)
    assert obj["version"] == "0"
    assert obj["device_vendor"] == "illusive"
    assert obj["device_event_class_id"] == "illusive:heartbeat"
    assert obj["name"] == "Heartbeat"
    assert obj["extensions"] == {
        "dvc": "10.118.182.162",
        "rt": "1600239263565",
        "cat": "illusive:SYS",
    }


def test_cef2():
    obj = oracle.parse_cef(CEF2)
    assert obj["version"] == "0"
    assert obj["device_vendor"] == "Cool Vendor"
    assert obj["device_product"] == "Cool Product"
    assert obj["device_event_class_id"] == "FLAKY_EVENT"
    assert obj["extensions"] == {
        "requestClientApplication": "Go-http-client/1.1",
        "sourceAddress": "127.0.0.1",
    }


def test_cef3_escaped_equals_preserved():
    obj = oracle.parse_cef(CEF3)
    exts = obj["extensions"]
    assert (
        exts["msg"]
        == r"theuser@domain.local logged out {User role \\= ROLE_ADMIN; Source address \\= 10.120.10.152}"
    )
    assert exts["duser"] == "theuser@domain.local"
    assert exts["outcome"] == "SUCCESS"
    assert exts["cat"] == "illusive:info"


def test_cef4_invalid_header():
    with pytest.raises(oracle.ParseError):
        oracle.parse_cef(CEF4)


def test_cef5_blank_keys_stripped():
    obj = oracle.parse_cef(CEF5)
    assert obj["version"] == "0"
    assert obj["device_vendor"] == "Cool Vendor"
    assert obj["device_product"] == "Cool Product"
    assert obj["device_event_class_id"] == "FLAKY_EVENT"
    exts = obj["extensions"]
    assert exts["requestClientApplication"] == "Go-http-client/1.1"
    assert exts["sourceAddress"] == "127.0.0.1"
    assert "blank" not in exts
    assert "blank2" not in exts


KV1 = "dvc=10.118.182.162 rt=1600239263565 cat=illusive{{COLON}}SYS"
KV2 = "message this stuff dvc=10.118.182.162 rt=1600239263565 cat=illusive{{COLON}}SYS"
KV3 = "dvc==10.118.182.162 rt==1600239263565 cat==illusive{{COLON}}SYS"


def test_kv_parse():
    assert oracle.parse_kv(KV1) == {
        "dvc": "10.118.182.162",
        "rt": "1600239263565",
        "cat": "illusive{{COLON}}SYS",
    }


@pytest.mark.parametrize("msg", [KV2, KV3])
def test_kv_invalid(msg):
    with pytest.raises(oracle.ParseError):
        oracle.parse_kv(msg)


SYSLOG1 = "<134>Apr 13 10:23:46 demo-host CEF:0|archer|archer|1.1.15.20|archer:heartbeat|Heartbeat|0|dvc=127.0.0.1 rt=1649820106246 cat=archer:SYS"
SYSLOG2 = r"<134>Apr 13 10:52:19 demo-host CEF:0|archer|archer|1.1.15.20|archer:access|Access event|10|msg=Source Port\=58326 Ports count\=1 cs1Label=Source URL rt=1649820149781 cs1=https://archer.local/demo src=192.168.1.11 destinationServiceName=PORT_SCAN externalId=2034604 Name dvc=192.168.1.50 suser=admin cat=archer:alerts shost=someone.local dhost=archer.local"
SYSLOG3 = '<191>1 2022-04-13T11:21:57.586018+07:00 demo-host demo-app 666 12543 [555] {"source": "192.168.1.11", "destination": "192.168.1.15", "message": "Port scan was detected"}'


def test_syslog_raw():
    assert oracle.syslog_raw(SYSLOG1) == SYSLOG1[5:]
    assert oracle.syslog_raw(SYSLOG2) == SYSLOG2[5:]
    assert oracle.syslog_raw(SYSLOG3) == SYSLOG3[5:]


def test_syslog_rfc3164():
    expected1 = "CEF:0|archer|archer|1.1.15.20|archer:heartbeat|Heartbeat|0|dvc=127.0.0.1 rt=1649820106246 cat=archer:SYS"
    assert oracle.syslog_rfc3164(SYSLOG1) == expected1
    expected2 = SYSLOG2.split("demo-host ", 1)[1]
    assert oracle.syslog_rfc3164(SYSLOG2) == expected2


def test_syslog_rfc5424():
    expected = '{"source": "192.168.1.11", "destination": "192.168.1.15", "message": "Port scan was detected"}'
    assert oracle.syslog_rfc5424(SYSLOG3) == expected


def test_json_mutate_add_remove_replace():
    line = '{"code": 200, "status": "success", "data": {"message": "hello world"}}'
    out = oracle.json_mutate(line, add=[{"key": "env", "value": "prod"}])
    assert (
        out
        == '{"code":200,"status":"success","data":{"message":"hello world"},"env":"prod"}'
    )
    out = oracle.json_mutate(line, remove=[{"key": "data.message"}])
    assert out == '{"code":200,"status":"success","data":{}}'
    out = oracle.json_mutate(
        line, replace=[{"key": "code", "value": 200, "new_value": 299}]
    )
    assert out == '{"code":299,"status":"success","data":{"message":"hello world"}}'
    # replace only fires on equality
    out = oracle.json_mutate(
        line, replace=[{"key": "code", "value": 500, "new_value": 299}]
    )
    assert out == '{"code":200,"status":"success","data":{"message":"hello world"}}'
    # non-JSON dropped
    assert oracle.json_mutate("not json at all") is None
    # dotted add creates nesting
    out = oracle.json_mutate("{}", add=[{"key": "a.b", "value": "x"}])
    assert out == '{"a":{"b":"x"}}'


def test_variable_replace():
    t = datetime(2022, 4, 13, 11, 21, 57, tzinfo=timezone.utc)
    s = "/logs/%year%/%month%/%day%/%hour%-%minute%-%second%-%uuid%.log"
    out = oracle.variable_replace(t, s, uuid="UUID")
    assert out == "/logs/2022/04/13/11-21-57-UUID.log"
    assert oracle.variable_replace(t, "%year_short% %month_name% %month_name_short%", uuid="u") == "22 April Apr"
    assert oracle.variable_replace(t, "%unix%", uuid="u") == str(int(t.timestamp()))


def test_html_roundtrip():
    text = 'hello <world> & "friends"\nsecond para'
    paras = text.split("\n")
    html = (
        "<html><head><script>var x=1;</script></head><body>"
        + "".join(f"<div class='noise'>n</div><p>{oracle.html_escape(p)}</p>" for p in paras)
        + '<pre data-log="1">'
        + oracle.html_escape("<134>Apr 13 10:23:46 h msg")
        + "</pre></body></html>"
    ).encode("utf-8")
    assert oracle.extract_text(html) == text
    assert oracle.extract_log_lines(html) == ["<134>Apr 13 10:23:46 h msg"]
