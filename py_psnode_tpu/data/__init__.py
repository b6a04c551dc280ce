from py_psnode_tpu.data.schema import (  # noqa: F401
    OdeSamples,
    DaeSamples,
    save_ode_samples,
    save_dae_samples,
)
from py_psnode_tpu.data.synthetic import (  # noqa: F401
    generate_avr_samples,
    generate_composite_load_dae_samples,
    generate_motor_dae_samples,
    generate_smib_dae_samples,
    write_avr_dataset,
    write_composite_dataset,
    write_motor_dataset,
    write_smib_dataset,
)
