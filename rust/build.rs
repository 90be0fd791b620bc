// Link against libblitzar_tpu.so. Set BLITZAR_TPU_LIB_DIR to the directory
// holding the built library (cbindings/build.sh <dir>).
fn main() {
    if let Ok(dir) = std::env::var("BLITZAR_TPU_LIB_DIR") {
        println!("cargo:rustc-link-search=native={dir}");
    }
    println!("cargo:rustc-link-lib=dylib=blitzar_tpu");
    println!("cargo:rerun-if-env-changed=BLITZAR_TPU_LIB_DIR");
}
