//! Validate the committed golden fixtures against the real crates the
//! reference (JosephCatrambone/aruco3) uses: imageproc 0.25 + image 0.25.
//!
//! The fixtures were produced by the numpy oracle
//! (aruco3_tpu/oracle.py) in an environment WITHOUT a Rust toolchain;
//! this harness is how a cargo-equipped environment confirms (or
//! refutes) the oracle's crate-semantics beliefs in minutes:
//!
//!   cd tests/golden/rust_validation && cargo run --release
//!
//! Any mismatch printed here is a real deviation between the oracle and
//! the reference's dependencies and must be fed back into
//! aruco3_tpu/oracle.py + PARITY.md.

use image::{GrayImage, Luma};
use serde::Deserialize;
use std::collections::BTreeSet;
use std::fs;

fn load(name: &str) -> String {
    // Fixtures live one directory up from the crate root.
    let p = format!("../{}", name);
    fs::read_to_string(&p).unwrap_or_else(|_| panic!("missing {}", p))
}

#[derive(Deserialize)]
struct AtCase {
    radius: u32,
    height: u32,
    width: u32,
    input: Vec<u8>,
    white: Vec<u8>,
}

#[derive(Deserialize)]
struct AtFile {
    cases: Vec<AtCase>,
}

fn check_adaptive_threshold() -> (usize, usize) {
    let f: AtFile = serde_json::from_str(&load("adaptive_threshold.json")).unwrap();
    let (mut ok, mut bad) = (0, 0);
    for c in f.cases {
        let img = GrayImage::from_raw(c.width, c.height, c.input.clone()).unwrap();
        let out = imageproc::contrast::adaptive_threshold(&img, c.radius);
        let mut mismatches = 0usize;
        for (i, p) in out.pixels().enumerate() {
            let white = (p[0] > 0) as u8;
            if white != c.white[i] {
                mismatches += 1;
            }
        }
        if mismatches == 0 {
            ok += 1;
        } else {
            bad += 1;
            println!(
                "adaptive_threshold: {} of {} pixels differ ({}x{}) — \
                 check tie policy (oracle: pixel*area >= sum => white)",
                mismatches,
                c.white.len(),
                c.width,
                c.height
            );
        }
    }
    (ok, bad)
}

#[derive(Deserialize)]
struct OtsuCase {
    input: Vec<u8>,
    level: u8,
}

#[derive(Deserialize)]
struct OtsuFile {
    cases: Vec<OtsuCase>,
}

fn check_otsu() -> (usize, usize) {
    let f: OtsuFile = serde_json::from_str(&load("otsu.json")).unwrap();
    let (mut ok, mut bad) = (0, 0);
    for c in f.cases {
        let n = c.input.len() as u32;
        let img = GrayImage::from_raw(n, 1, c.input.clone()).unwrap();
        let level = imageproc::contrast::otsu_level(&img);
        if level == c.level {
            ok += 1;
        } else {
            bad += 1;
            println!("otsu_level: crate {} vs oracle {}", level, c.level);
        }
    }
    (ok, bad)
}

#[derive(Deserialize)]
struct TrCase {
    src: u32,
    dst: u32,
    #[serde(default)]
    input: Vec<u8>,
    #[serde(default)]
    output_float: Vec<f64>,
    #[serde(default)]
    otsu_level: Option<u8>,
    #[serde(default)]
    bits_gt127: Vec<u8>,
    #[serde(default)]
    matrix: Vec<f64>,
}

#[derive(Deserialize)]
struct TrFile {
    cases: Vec<TrCase>,
}

fn check_triangle_resize() -> (usize, usize) {
    let f: TrFile = serde_json::from_str(&load("triangle_resize.json")).unwrap();
    let (mut ok, mut bad) = (0, 0);
    for c in f.cases {
        if c.input.is_empty() {
            continue; // matrix-only documentation case
        }
        let img = GrayImage::from_raw(c.src, c.src, c.input.clone()).unwrap();
        // Raw-value comparison: crate output is u8; oracle output is the
        // separable float filter.  |diff| <= 1 allows the crate's
        // rounding; anything larger is a semantics mismatch.
        let out = image::imageops::resize(
            &img,
            c.dst,
            c.dst,
            image::imageops::FilterType::Triangle,
        );
        let mut worst = 0.0f64;
        for (i, p) in out.pixels().enumerate() {
            worst = worst.max((p[0] as f64 - c.output_float[i]).abs());
        }
        // Bit comparison: exactly the pipeline's use (Otsu-binarized
        // input, > 127 read) — must agree bit for bit.
        let level = c.otsu_level.unwrap();
        let mut bin = GrayImage::new(c.src, c.src);
        for (x, y, p) in img.enumerate_pixels() {
            bin.put_pixel(x, y, Luma([if p[0] > level { 255 } else { 0 }]));
        }
        let outb = image::imageops::resize(
            &bin,
            c.dst,
            c.dst,
            image::imageops::FilterType::Triangle,
        );
        let mut bit_mismatch = 0usize;
        for (i, p) in outb.pixels().enumerate() {
            if ((p[0] > 127) as u8) != c.bits_gt127[i] {
                bit_mismatch += 1;
            }
        }
        if worst <= 1.0 && bit_mismatch == 0 {
            ok += 1;
        } else {
            bad += 1;
            println!(
                "triangle_resize {}->{}: worst raw diff {:.3}, {} bit mismatches",
                c.src, c.dst, worst, bit_mismatch
            );
        }
    }
    (ok, bad)
}

#[derive(Deserialize)]
struct FcCase {
    height: u32,
    width: u32,
    input: Vec<u8>,
    contours: Vec<Vec<[i64; 2]>>,
}

#[derive(Deserialize)]
struct FcFile {
    cases: Vec<FcCase>,
}

fn check_find_contours() -> (usize, usize) {
    let f: FcFile = serde_json::from_str(&load("find_contours.json")).unwrap();
    let (mut ok, mut bad) = (0, 0);
    for c in f.cases {
        let mut img = GrayImage::new(c.width, c.height);
        for y in 0..c.height {
            for x in 0..c.width {
                let v = c.input[(y * c.width + x) as usize];
                img.put_pixel(x, y, Luma([if v != 0 { 255 } else { 0 }]));
            }
        }
        let contours = imageproc::contours::find_contours::<i64>(&img);
        // Compare as multisets of point-sets: traversal start/direction
        // conventions may differ without changing which borders exist —
        // which is what candidate extraction depends on.
        let to_set = |pts: &[[i64; 2]]| -> BTreeSet<(i64, i64)> {
            pts.iter().map(|p| (p[0], p[1])).collect()
        };
        let mut got: Vec<BTreeSet<(i64, i64)>> = contours
            .iter()
            .map(|ct| ct.points.iter().map(|p| (p.x, p.y)).collect())
            .collect();
        let mut want: Vec<BTreeSet<(i64, i64)>> =
            c.contours.iter().map(|ct| to_set(ct)).collect();
        got.sort();
        want.sort();
        if got == want {
            ok += 1;
        } else {
            bad += 1;
            println!(
                "find_contours ({}x{}): crate found {} borders vs oracle {}",
                c.width,
                c.height,
                got.len(),
                want.len()
            );
        }
    }
    (ok, bad)
}

#[derive(Deserialize)]
struct DpCase {
    epsilon: f64,
    input: Vec<[i64; 2]>,
    output: Vec<[i64; 2]>,
}

#[derive(Deserialize)]
struct DpFile {
    cases: Vec<DpCase>,
}

fn check_polygon_dp() -> (usize, usize) {
    let f: DpFile = serde_json::from_str(&load("polygon_dp.json")).unwrap();
    let (mut ok, mut bad) = (0, 0);
    for c in f.cases {
        let pts: Vec<imageproc::point::Point<i64>> = c
            .input
            .iter()
            .map(|p| imageproc::point::Point::new(p[0], p[1]))
            .collect();
        let out = imageproc::geometry::approximate_polygon_dp(&pts, c.epsilon, true);
        let got: Vec<[i64; 2]> = out.iter().map(|p| [p.x, p.y]).collect();
        // Vertex count is what the reference's 4-vertex gate reads
        // (aruco.rs:136); exact vertices should also agree.
        if got.len() == c.output.len() {
            ok += 1;
            if got != c.output {
                println!(
                    "polygon_dp: same count ({}) but different vertices — \
                     inspect split convention",
                    got.len()
                );
            }
        } else {
            bad += 1;
            println!(
                "polygon_dp: crate {} vertices vs oracle {}",
                got.len(),
                c.output.len()
            );
        }
    }
    (ok, bad)
}

fn main() {
    let mut total = (0, 0);
    for (name, f) in [
        ("adaptive_threshold", check_adaptive_threshold as fn() -> (usize, usize)),
        ("otsu_level", check_otsu),
        ("triangle_resize", check_triangle_resize),
        ("find_contours", check_find_contours),
        ("approximate_polygon_dp", check_polygon_dp),
    ] {
        let (ok, bad) = f();
        println!("{}: {} ok, {} mismatched", name, ok, bad);
        total.0 += ok;
        total.1 += bad;
    }
    if total.1 > 0 {
        println!("FAIL: {} fixture cases mismatched", total.1);
        std::process::exit(1);
    }
    println!("all {} fixture cases validated against the crates", total.0);
}
