"""RegisterConfig parses the reference's flat snake_case JSON schema
(/root/reference/src/registercallback.cpp:24-91,
/root/reference/config/register_config.json)."""
import json

import numpy as np
import pytest

from slamtpu.runtime.config import PipelineConfig, RegisterConfig

# byte-equivalent copy of the reference's shipped register_config.json values
REFERENCE_JSON = {
    "register_parameter": {
        "num_threads": 8,
        "mapvoxelsize": 0.5,
        "registration_method": "SVNNDT",
        "ndt_resolution": 2.0,
        "ndt_transform_epsilon": 0.0001,
        "ndt_neighborhood_search_method": "DIRECT7",
        "ndt_regularization_scale_factor": 10.0,
        "gicp_corr_dist_threshold": 5.0,
        "gicp_transform_epsilon": 0.0001,
        "svn_ndt_resolution": 1.0,
        "svn_ndt_neighborhood_search_method": "DIRECT7",
        "svn_ndt_number_particle": 20,
        "svn_ndt_max_iterations": 100,
        "svn_ndt_kernel_bandwith": 5.0,
        "svn_ndt_step_size": 0.05,
        "svn_ndt_stop_threshold": 1e-4,
        "svn_ndt_set_outlier_ratio": 0.55,
    }
}


class TestRegisterConfigSchema:
    def test_reference_json_round_trip(self):
        cfg = RegisterConfig.from_json(REFERENCE_JSON)
        assert cfg.method == "SVNNDT"
        assert cfg.ndt_resolution == 2.0
        assert cfg.ndt_transform_epsilon == 1e-4
        assert cfg.search_method == "DIRECT7"
        assert cfg.svn_search_method == "DIRECT7"
        assert cfg.regularization_scale_factor == 10.0
        assert cfg.gicp_corr_dist_threshold == 5.0
        assert cfg.svn_resolution == 1.0
        assert cfg.svn_particles == 20
        assert cfg.svn_max_iterations == 100
        assert cfg.svn_kernel_h == 5.0
        assert cfg.svn_step_size == 0.05
        assert cfg.svn_stop_thresh == 1e-4
        assert cfg.svn_outlier_ratio == 0.55
        assert cfg.map_voxel_size == 0.5

    def test_user_edited_values_are_not_silently_dropped(self):
        obj = json.loads(json.dumps(REFERENCE_JSON))
        obj["register_parameter"]["svn_ndt_number_particle"] = 7
        obj["register_parameter"]["ndt_resolution"] = 3.5
        obj["register_parameter"]["ndt_max_iterations"] = 12  # slamtpu extension
        cfg = RegisterConfig.from_json(obj)
        assert cfg.svn_particles == 7
        assert cfg.ndt_resolution == 3.5
        assert cfg.ndt_max_iterations == 12

    def test_unknown_key_fails_loudly(self):
        obj = json.loads(json.dumps(REFERENCE_JSON))
        obj["register_parameter"]["svn_ndt_numberparticle"] = 5  # typo
        with pytest.raises(ValueError, match="svn_ndt_numberparticle"):
            RegisterConfig.from_json(obj)

    def test_both_regularization_spellings(self):
        # the shipped JSON spells it ndt_regularization_scale_factor; the
        # reference parser looks for regularization_scale_factor
        assert (
            RegisterConfig.from_json(
                {"register_parameter": {"ndt_regularization_scale_factor": 4.0}}
            ).regularization_scale_factor
            == 4.0
        )
        assert (
            RegisterConfig.from_json(
                {"register_parameter": {"regularization_scale_factor": 3.0}}
            ).regularization_scale_factor
            == 3.0
        )


class TestBerlinPreset:
    def test_matches_reference_lidar_config(self):
        """config/lidar_config_berlin.json parity: extrinsics + vehicle box."""
        cfg = PipelineConfig.berlin()
        np.testing.assert_array_equal(
            cfg.lidar.body_to_lidar_rotation, np.diag([-1.0, -1.0, 1.0])
        )
        np.testing.assert_allclose(
            cfg.lidar.body_to_lidar_translation, [0.135, 0.0, 0.1243]
        )
        np.testing.assert_allclose(cfg.lidar.vehicle_box_center, [-3.0, 0.0, 1.0])
        np.testing.assert_allclose(cfg.lidar.vehicle_box_dimensions, [10.5, 3.0, 2.1])
        assert cfg.lidar.channel_stride == 4
        assert cfg.lidar.z_filter == (-250.0, 0.0)
        assert cfg.lidar.reflectivity_threshold == 60.0
        assert cfg.lidar.range_filter == (0.0, 250.0)
