"""Execute the repo notebooks in place, storing real outputs (VERDICT r4 #8).

The reference's notebooks are its paper-figure record (SURVEY §2 #32); ours
must show live outputs, not just source.  This script prepares small
synthetic inputs where a notebook's placeholder paths need them (two-stage
SR -> PF predictions for the PF notebooks, dataset files for the
distribution ones), substitutes the placeholders, executes each notebook
with nbclient on the CPU backend, and writes the executed notebook back —
outputs, figures and all.

    python scripts/execute_notebooks.py [names...]

Idempotent: prepared artifacts land in data/ and runs/nb_artifacts/ (both
gitignored) and are reused on re-runs.
"""

import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# NOTE: do NOT set MPLBACKEND here — it would override ipykernel's
# matplotlib-inline backend and the executed notebooks would store no
# figure outputs (the whole point of running them)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

ART = os.path.join(ROOT, "runs", "nb_artifacts")


def prep_artifacts():
    """Synthetic single_e/multipart files + a two-stage SR->PF prediction
    chain (mirrors the tests' fixture flow at res_factor=4, the PF
    notebooks' setting)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np  # noqa: F401
    import yaml

    from superresolutionhep_tpu.data.synthetic import GeneratorConfig, write_synthetic_file

    os.makedirs(ART, exist_ok=True)
    se = os.path.join(ROOT, "data", "single_e", "train.h5")
    if not os.path.exists(se):
        os.makedirs(os.path.dirname(se), exist_ok=True)
        write_synthetic_file(se, 512, seed=0, config=GeneratorConfig(single_electron=True))
    mp = os.path.join(ART, "multipart.h5")
    if not os.path.exists(mp):
        write_synthetic_file(
            mp, 64, seed=5,
            config=GeneratorConfig(res_factor=4, max_particles=4, window_lr_cells=1),
        )

    sr_pred = os.path.join(ART, "sr_pred.h5")
    pf_low = os.path.join(ART, "pf_low.h5")
    pf_high = os.path.join(ART, "pf_high.h5")
    if all(os.path.exists(p) for p in (sr_pred, pf_low, pf_high)):
        return {"se": se, "mp": mp, "sr": sr_pred, "pf_low": pf_low, "pf_high": pf_high}

    import jax.numpy as jnp

    from test_pf_pipeline import pf_config_mv
    from test_sr_trainer import make_configs

    from superresolutionhep_tpu.data.pf_dataset import PflowEvents, collate_pf
    from superresolutionhep_tpu.inference.pf import PFInference
    from superresolutionhep_tpu.inference.sr import SRInference
    from superresolutionhep_tpu.models.pf.model_pf import SAPF
    from superresolutionhep_tpu.train.sr_trainer import SRTrainer
    from superresolutionhep_tpu.transforms import build_var_transforms

    config_mv, config_t = make_configs(mp, mp, os.path.join(ART, "run"))
    config_mv["res_factor"] = 4
    mv_path, t_path = os.path.join(ART, "mv.yml"), os.path.join(ART, "t.yml")
    yaml.safe_dump(config_mv, open(mv_path, "w"))
    yaml.safe_dump(config_t, open(t_path, "w"))
    trainer = SRTrainer(config_mv, config_t, run_dir=os.path.join(ART, "run"), seed=0)
    inf = SRInference(
        {"model": {"config_path_mv": mv_path, "config_path_t": t_path,
                   "checkpoint_path": None, "n_steps": 5, "n_steps_to_store": 2}},
        params=trainer.state.params,
    )
    inf.run_pred({
        "truth_path": mp, "pred_path": sr_pred, "entry_start": 0, "n_events": 24,
        "n_ensemble": 2, "batch_size": 4, "ode_method": "midpoint",
        "save_ensemble_components": True, "store_energy_incidence": True,
        "max_particles": 4,
    })

    cfg_mv_pf = pf_config_mv()
    pf_mv_path = os.path.join(ART, "pf_mv.yml")
    yaml.safe_dump(cfg_mv_pf, open(pf_mv_path, "w"))
    for res, out_path in (("low", pf_low), ("high", pf_high)):
        cfg_t_pf = {"resolution": res, "energy_threshold": 1.0, "loss_on_inc_wts": True,
                    "bucket_quantum": 64, "card_loss_weight": 0.5}
        pf_t_path = os.path.join(ART, f"pf_t_{res}.yml")
        yaml.safe_dump(cfg_t_pf, open(pf_t_path, "w"))
        ds = PflowEvents(sr_pred, cfg_mv_pf, energy_threshold=1.0, res=res, load_incidence=True)
        ev0 = ds.get_event(0)
        pad = ((len(ev0["cell_e"]) + 127) // 128) * 128
        batch = {k: jnp.asarray(v) for k, v in collate_pf([ev0], pad, 4).items() if k != "idx"}
        model = SAPF(config_pf=cfg_mv_pf["pf_model"],
                     transforms=build_var_transforms(cfg_mv_pf["var_transform"]))
        variables = model.init(jax.random.PRNGKey(1), batch)
        pfi = PFInference(
            {"model": {"config_path_mv": pf_mv_path, "config_path_t": pf_t_path,
                       "checkpoint_path": None}, "batch_size": 4},
            params=variables["params"],
        )
        pfi.run_pred({"glob_arg": sr_pred, "pred_path": out_path, "store_inc_wt": True})
    return {"se": se, "mp": mp, "sr": sr_pred, "pf_low": pf_low, "pf_high": pf_high}


def execute(nb_path: str, substitutions):
    import nbformat
    from nbclient import NotebookClient

    nb = nbformat.read(nb_path, as_version=4)
    for cell in nb.cells:
        if cell.cell_type != "code":
            continue
        for pat, rep in substitutions:
            cell.source = re.sub(pat, rep, cell.source)
    client = NotebookClient(
        nb, timeout=1800, kernel_name="python3",
        resources={"metadata": {"path": os.path.dirname(nb_path)}},
    )
    client.execute()
    nbformat.write(nb, nb_path)
    n_out = sum(1 for c in nb.cells if c.cell_type == "code" and c.get("outputs"))
    print(f"executed {os.path.basename(nb_path)}: {n_out} cells with outputs", flush=True)


def main():
    paths = prep_artifacts()
    rel = {k: os.path.relpath(v, os.path.join(ROOT, "notebooks")) for k, v in paths.items()}
    subs = {
        "data_inspection": [],
        "cell_cardinality": [],
        "performance_single_electron": [],
        "dataset_distribution": [
            (r"'<path_to_single_electron_data>'", f"'{rel['se']}'"),
            (r"'<path_to_multipart_data>'", f"'{rel['mp']}'"),
        ],
        "performance_multipart_pf": [
            (r"'<sr_pred>', '<pf_lr_pred>', '<pf_hr_pred>'",
             f"'{rel['sr']}', '{rel['pf_low']}', '{rel['pf_high']}'"),
        ],
        "performance_pf_ed": [
            (r"'<sr_pred>', '<pf_lr_pred>', '<pf_hr_pred>', '<truth>'",
             f"'{rel['sr']}', '{rel['pf_low']}', '{rel['pf_high']}', '{rel['mp']}'"),
        ],
    }
    only = set(sys.argv[1:])
    for name, sub in subs.items():
        if only and name not in only:
            continue
        execute(os.path.join(ROOT, "notebooks", f"{name}.ipynb"), sub)


if __name__ == "__main__":
    main()
