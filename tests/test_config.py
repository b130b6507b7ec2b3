"""Settings registry + .settings parser tests (parity with the reference's
settings semantics: default_config.cpp parameter table, deprecation
migration :280-360, layered resolution SettingsInitializer.cpp)."""
import pytest

from trex_tpu.config import (
    AccessLevel,
    format_value,
    parse_settings_text,
    parse_value,
)


def test_registry_has_full_parameter_surface(settings):
    names = settings.names()
    assert len(names) >= 370
    for key in [
        "track_threshold", "track_max_individuals", "track_max_speed",
        "match_mode", "match_min_probability", "detect_threshold",
        "detect_type", "detect_size_filter", "track_size_filter",
        "cm_per_pixel", "meta_real_width", "calculate_posture",
        "individual_image_size", "individual_image_normalization",
        "midline_resolution", "outline_smooth_step", "output_fields",
        "accumulation_enable", "visual_identification_version",
        "frame_rate", "meta_encoding", "averaging_method",
        "average_samples", "blobs_per_thread", "auto_quit", "auto_train",
    ]:
        assert key in settings, key


def test_defaults_match_reference(settings):
    assert settings["match_mode"] == "automatic"
    assert settings["match_min_probability"] == pytest.approx(0.1)
    assert settings["track_max_individuals"] == 1024
    assert settings["midline_resolution"] == 25
    assert settings["detect_threshold"] == 15
    assert settings["individual_image_size"] == [80.0, 80.0]
    assert settings["calculate_posture"] is True


def test_typed_set_and_coercion(settings):
    settings.set("track_threshold", "25")
    assert settings["track_threshold"] == 25
    settings.set("cm_per_pixel", 0.05)
    assert settings["cm_per_pixel"] == pytest.approx(0.05)
    settings.set("track_size_filter", "[[70,420]]")
    assert settings["track_size_filter"] == [[70, 420]]


def test_deprecation_migration(settings):
    # old -> new name mapping from the reference deprecation table
    settings.set("number_fish", 8)
    assert settings["track_max_individuals"] == 8
    settings.set("threshold_constant", 33)
    assert settings["track_threshold"] == 33
    settings.set("fish_max_speed", 900)
    assert settings["track_max_speed"] == 900
    # dropped parameter: silently ignored
    settings.set("recognition_enable", True)


def test_access_levels(settings):
    with pytest.raises(PermissionError):
        settings.set("version", "x", max_access=AccessLevel.PUBLIC)
    settings.set("version", "x", max_access=AccessLevel.SYSTEM)
    assert settings["version"] == "x"


def test_change_callback(settings):
    seen = {}
    settings.on_change(lambda k, v: seen.__setitem__(k, v))
    settings.set("track_threshold", 42)
    assert seen == {"track_threshold": 42}


def test_parse_reference_test_settings(fixture_settings_path, settings):
    values = parse_settings_text(fixture_settings_path.read_text())
    assert values["track_max_individuals"] == 8
    assert values["track_threshold"] == 12
    assert values["detect_size_filter"] == [[1, 10000]]
    assert values["individual_prefix"] == "fish"
    assert values["output_fields"] == [
        ["X", ["wcentroid"]], ["SPEED", ["wcentroid"]],
        ["midline_length", ["RAW"]], ["num_pixels", ["RAW"]],
        ["blobid", []],
    ]
    assert values["track_threshold_is_absolute"] is False
    for k, v in values.items():
        settings.set(k, v, source="test.settings")
    assert settings["track_max_individuals"] == 8


def test_meta_value_roundtrip():
    for v in [True, False, 12, 0.5, "fish", [1, 2, 3], [[70, 420]],
              {"a": 1, "b": [2, 3]}, ""]:
        assert parse_value(format_value(v)) == v


def test_source_tracking(settings):
    assert settings.source_of("track_threshold") == "default"
    settings.set("track_threshold", 9, source="cmdline")
    assert settings.source_of("track_threshold") == "cmdline"
