"""Leak-property tests mirroring the reference's secret_test
(/root/reference/pkg/types/secret/string_test.go:13-49): the raw value must not
appear through any formatting path."""

import io
import logging
import pickle

import pytest

from hatchery_spark.secret import Secret

RAW = "super-sensitive-token-xyz"


@pytest.fixture
def s():
    return Secret(RAW)


def test_str(s):
    assert str(s) == "***" and RAW not in str(s)


def test_repr(s):
    assert RAW not in repr(s)


def test_fstring_and_format(s):
    assert RAW not in f"value={s}" and RAW not in "{}".format(s) and RAW not in format(s, ">30")


def test_logging_path(s):
    buf = io.StringIO()
    logger = logging.getLogger("secret_test")
    logger.addHandler(logging.StreamHandler(buf))
    logger.warning("token is %s (%r)", s, s)
    assert RAW not in buf.getvalue()


def test_print_container(s, capsys):
    print([s], {"k": s})
    assert RAW not in capsys.readouterr().out


def test_unmask_is_explicit(s):
    assert s.unmask() == RAW


def test_not_picklable(s):
    with pytest.raises(TypeError):
        pickle.dumps(s)
