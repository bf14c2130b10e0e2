import { useRef, useState } from "react";

/** Drag-drop / click-to-choose zone with an image MIME filter. */
export default function DropZone({ onFiles }) {
  const inputRef = useRef(null);
  const [hover, setHover] = useState(false);

  const accept = (list) =>
    onFiles(Array.from(list).filter((f) => f.type.startsWith("image/")));

  return (
    <div
      className={"drop" + (hover ? " hover" : "")}
      onClick={() => inputRef.current.click()}
      onDragOver={(e) => {
        e.preventDefault();
        setHover(true);
      }}
      onDragLeave={() => setHover(false)}
      onDrop={(e) => {
        e.preventDefault();
        setHover(false);
        accept(e.dataTransfer.files);
      }}
    >
      Drag &amp; drop images here, or click to choose files
      <input
        ref={inputRef}
        type="file"
        multiple
        accept="image/*"
        hidden
        onChange={(e) => {
          accept(e.target.files);
          e.target.value = "";
        }}
      />
    </div>
  );
}
