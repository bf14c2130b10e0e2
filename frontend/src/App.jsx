import UploadForm from "./components/UploadForm.jsx";

export default function App() {
  return <UploadForm />;
}
