"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-device (data-parallel / sharding) paths are exercised without TPU
hardware via XLA's host-platform device-count override, per SURVEY.md §4.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize imports jax (registering the axon TPU plugin)
# before conftest runs, so the env var alone is too late — override the
# already-read config value as well (backends are still uninitialized here).
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_DATA = pathlib.Path("/root/reference/datasets/500_100_100")

import pytest


@pytest.fixture(scope="session")
def reference_cgan_dir():
    d = REFERENCE_DATA / "cgan"
    if not d.exists():
        pytest.skip("reference dataset not mounted")
    return d


# ---------------------------------------------------------------------------
# fast/slow split: the full suite is ~45 min on the 1-core box (compiles
# dominate); `-m "not slow"` keeps an ~8 min iteration loop.  Durations
# measured round 3 (tests >=18 s, full run 2692 s); re-measure with
# `pytest --durations=60` when adding heavy tests.
# ---------------------------------------------------------------------------

_SLOW_TESTS = {
    "TestTraining::test_pseudo_labeling",
    "TestTraining::test_learns_synthetic_task",
    "TestCalibratorResume::test_resume_continues_epoch_count",
    "TestTrainStep::test_adversarial_gradient_flag",
    "TestTrainStep::test_single_step_finite_and_updates",
    "TestCalibratorResume::test_resume_without_checkpoint_is_fresh",
    "TestTrainStep::test_masked_samples_do_not_affect_grads",
    "TestTrainStep::test_device_patches_mode",
    "test_sharded_loss_psums_to_full_batch",
    "TestShardMapMore::test_wgan_fused_step_dp_equivalence",
    "TestCalibratorReleaseSnapshot::test_calibrator_writes_release_on_best",
    "TestCalibratorResume::test_resume_restores_scheduler_state",
    "TestCopyPaste::test_train_step_with_copy_paste",
    "TestDetectorDpStep::test_padded_slots_do_not_change_update",
    "TestTrainLoop::test_two_epoch_loop_writes_history_and_ckpt",
    "TestHostCommands::test_pretrain_main",
    "TestKfoldParallelPipeline::test_sequential_pipeline_dp",
    "TestDetectorDpStep::test_replicas_stay_bitwise_in_sync",
    "TestFoldStep::test_vstep_matches_single_fold_steps",
    "TestTrainLoop::test_dp_runs_on_8_device_mesh",
    "TestTraining::test_single_step_finite",
    "TestDetectorResumePastEnd::test_relaunch_of_completed_run_is_a_noop",
    "TestTraining::test_loss_decreases_overfitting_one_batch",
    "TestAugDtype::test_bf16_aug_pipeline_step",
    "TestDetectorDpStep::test_fold_by_data_mesh_step",
    "TestKfoldParallelPipeline::test_pipeline_smoke",
    "TestNonPow2Width::test_m_scale_width_builds",
    "TestTrainFolds::test_folds_diverge_and_early_bookkeeping",
    "TestPretrain::test_saved_backbone_grafts_via_init_from",
    "TestFoldStep::test_four_folds_on_four_devices_mosaic",
    "TestReleaseSnapshots::test_trainer_writes_release_on_best",
    "TestTrainFolds::test_data_parallel_folds",
    "TestDetectorDpStep::test_train_detector_dp_end_to_end",
    "TestModels::test_wrn_discriminator",
    "TestTraining::test_mosaic_step_runs_and_ema_updates",
    "TestModels::test_wrn_selected_from_config",
    "TestTrainFolds::test_unequal_folds_wrap",
    "TestPretrain::test_transfer_backbone_shapes",
    "TestHostCommands::test_export_model_main",
    "TestPretrain::test_reconstruction_loss_decreases",
    "TestReleaseSnapshots::test_bf16_snapshot_grafts_back_to_f32_state",
    "TestFitnessSelection::test_fitness_select_and_on_eval",
    # round-5 SSL framework-grade additions (each compiles a fresh step)
    "TestTraining::test_dp_runs_and_learns",
    "TestTraining::test_checkpoint_resume_continues",
    "TestTraining::test_early_stop_on_patience",
    "TestTraining::test_aug_step_finite_and_shapes",
    "TestTraining::test_cosine_lr_schedule_decays",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: takes >15 s on the 1-core CPU box (compile-heavy)"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.nodeid.split("::", 1)[-1].split("[")[0]
        if name in _SLOW_TESTS or name.split("::")[-1] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
